"""Golden-file regression pins for the PC sampler (fixed PRNG, CPU).

Catches silent numerics changes across refactors: the sampler trajectory for
a fixed init/key/tiny-model must stay within fp tolerance of the committed
values (regenerate deliberately via the snippet in tests/golden/README).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pc_sampler_cpu.npz")


def test_pc_sampler_golden():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=64, embed_dim=32,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(1234), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    golden = np.load(GOLDEN)
    for name, sde in [("subvp", sde_lib.SubVPSDE(N=50)),
                      ("vp", sde_lib.VPSDE(N=50)),
                      ("ve", sde_lib.VESDE(N=50))]:
        score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
        eps = 1e-5 if name == "ve" else 1e-3
        sampler = get_pc_sampler(sde, (4, 63), score_fn, denoise=True, eps=eps)
        _, x = sampler(jax.random.PRNGKey(777))
        ref = golden[name]
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-3 * scale,
                                   err_msg=name)


def test_quality_vs_nfe_artifact_pins():
    """Pin the committed quality-vs-NFE artifact (round 4, real 400k
    checkpoint on the TPU) to the serving guidance PERFORMANCE.md derives
    from it, so neither the table nor the claims can silently rot:

    - DPM-Solver++(2M)@20 and DDIM@50 hold full-schedule (pc-1000) APD;
    - every bf16 mode's samples score data-class bpd (within 0.45 of pc);
    - int8 generation holds APD within 5% of its bf16 twin but pays a
      bpd tail on the few-step paths (the measured rounding
      self-correction effect, PERFORMANCE.md "Quality vs NFE");
    - int8 degrades completion outright (the reason completion serves
      bf16);
    - int8 is only ever offered as a speedup (poses/s above its twin).

    Regenerate deliberately with benchmarks/quality_vs_nfe.py on a
    trained checkpoint.
    """
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "protocols_r4", "quality_vs_nfe.json")
    rows = {r["mode"]: r for r in json.load(open(path))["rows"]}

    expected = {"pc-1000 bf16", "pc-1000 int8", "ddim-50 bf16",
                "ddim-50 int8", "ddim-20 bf16", "ddim-20 int8",
                "ddim-10 bf16", "ddim-10 int8", "dpm-20 (xla)",
                "dpm-10 (xla)", "completion pc-1000 bf16",
                "completion pc-1000 int8"}
    assert expected <= set(rows), expected - set(rows)

    pc = rows["pc-1000 bf16"]
    # protocol-level sanity: same ballpark as the r3 config-1 protocol APD
    assert 0.85 < pc["apd"] < 0.96, pc["apd"]

    # quality-at-speed winners hold full-schedule APD
    assert abs(rows["dpm-20 (xla)"]["apd"] - pc["apd"]) / pc["apd"] < 0.03
    assert abs(rows["ddim-50 bf16"]["apd"] - pc["apd"]) / pc["apd"] < 0.01

    # all bf16 generation modes produce data-class-density samples
    for mode in ("ddim-50 bf16", "ddim-20 bf16", "ddim-10 bf16",
                 "dpm-20 (xla)", "dpm-10 (xla)"):
        assert abs(rows[mode]["bpd"] - pc["bpd"]) < 0.45, (mode, rows[mode])

    for b16, i8 in (("pc-1000 bf16", "pc-1000 int8"),
                    ("ddim-50 bf16", "ddim-50 int8"),
                    ("ddim-20 bf16", "ddim-20 int8"),
                    ("ddim-10 bf16", "ddim-10 int8")):
        # int8 holds APD within 5% of its bf16 twin...
        assert abs(rows[i8]["apd"] - rows[b16]["apd"]) / rows[b16]["apd"] < 0.05
        # ...and is only offered because it is faster
        assert rows[i8]["poses_per_sec"] > rows[b16]["poses_per_sec"]

    # the measured int8 bpd tail on few-step paths (less per-step rounding
    # self-correction): present but bounded — this is why few-step serving
    # defaults to bf16
    for b16, i8 in (("ddim-50 bf16", "ddim-50 int8"),
                    ("ddim-20 bf16", "ddim-20 int8"),
                    ("ddim-10 bf16", "ddim-10 int8")):
        gap = rows[i8]["bpd"] - rows[b16]["bpd"]
        assert 0.0 < gap < 4.0, (b16, gap)

    # int8 degrades the completion path outright — completion serves bf16
    assert (rows["completion pc-1000 int8"]["mpjpe"]
            > 1.2 * rows["completion pc-1000 bf16"]["mpjpe"])


def test_quality_vs_nfe_mixed_artifact_pins():
    """Pin the mixed-precision (int8 head + bf16 tail) rerun artifact to
    the serving guidance it added to PERFORMANCE.md:

    - mixed generation recovers bf16-level quality: APD within 2% of the
      same-session bf16 row and bpd within 0.05 (plain int8: 4.4% APD gap
      and a +0.37 bpd shift — the int8 bpd cost is entirely late-step);
    - mixed runs at plain-int8 speed (>= 0.9x the same-session int8 row);
    - the completion rescue is PARTIAL and monotone in the tail length —
      the measured reason completion keeps serving bf16.

    Regenerate with benchmarks/quality_vs_nfe.py --only pc-1000.
    """
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "protocols_r4", "quality_vs_nfe_mixed.json")
    rows = {r["mode"]: r for r in json.load(open(path))["rows"]}

    pc = rows["pc-1000 bf16"]
    i8 = rows["pc-1000 int8"]
    mx = rows["pc-1000 int8+bf16-tail-100"]
    assert abs(mx["apd"] - pc["apd"]) / pc["apd"] < 0.02, mx["apd"]
    assert abs(mx["bpd"] - pc["bpd"]) < 0.05, mx["bpd"]
    # strictly closer to bf16 than plain int8 on both quality axes
    assert abs(mx["apd"] - pc["apd"]) < abs(i8["apd"] - pc["apd"])
    assert abs(mx["bpd"] - pc["bpd"]) < abs(i8["bpd"] - pc["bpd"])
    assert mx["poses_per_sec"] > 0.9 * i8["poses_per_sec"]

    c_bf16 = rows["completion pc-1000 bf16"]["mpjpe"]
    c_int8 = rows["completion pc-1000 int8"]["mpjpe"]
    tails = [rows[f"completion pc-1000 int8+bf16-tail-{k}"]["mpjpe"]
             for k in (50, 100, 200)]
    # monotone partial rescue: int8 > tail-50 > tail-100 > tail-200 > bf16
    seq = [c_int8] + tails + [c_bf16]
    assert all(a > b for a, b in zip(seq, seq[1:])), seq
    # ...but still a real gap at tail-200: completion serves bf16
    assert tails[-1] > 1.1 * c_bf16, (tails[-1], c_bf16)


def test_quality_vs_nfe_chan_artifact_pins():
    """Pin the per-channel (SmoothQuant-fold) int8 artifact to the serving
    guidance PERFORMANCE.md derives from it ("Per-channel int8 — the fix
    at the source"):

    - generation: int8-chan APD within 2% of the same-session bf16 row
      and bpd within 0.05 (plain per-tensor int8: 4.4% / +0.37) — at
      plain-int8 speed up to a 10% benchmark-variance tolerance (same
      kernel inner loop, scales folded into the weights);
    - completion: int8-chan lands within 5% of bf16 MPJPE, vs the
      per-tensor mode's >1.2x degradation and the mixed mode's partial
      tail-200 rescue — completion may serve int8 again;
    - few-step: the int8-chan bpd tail vs the bf16 twins (main artifact,
      same seeds -> deterministic quality) is < 0.25 where per-tensor
      paid +1.8-2.2.

    Regenerate with benchmarks/quality_vs_nfe.py --only chan,pc-1000.
    """
    import json

    base = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "protocols_r4")
    rows = {r["mode"]: r for r in json.load(
        open(os.path.join(base, "quality_vs_nfe_chan.json")))["rows"]}
    main = {r["mode"]: r for r in json.load(
        open(os.path.join(base, "quality_vs_nfe.json")))["rows"]}

    pc = rows["pc-1000 bf16"]
    i8 = rows["pc-1000 int8"]
    ch = rows["pc-1000 int8-chan"]
    assert abs(ch["apd"] - pc["apd"]) / pc["apd"] < 0.02, ch["apd"]
    assert abs(ch["bpd"] - pc["bpd"]) < 0.05, ch["bpd"]
    # strictly closer to bf16 than per-tensor int8 on both quality axes
    assert abs(ch["apd"] - pc["apd"]) < abs(i8["apd"] - pc["apd"])
    assert abs(ch["bpd"] - pc["bpd"]) < abs(i8["bpd"] - pc["bpd"])
    # same kernel inner loop as per-tensor int8 (scales folded into the
    # weights) — equal speed up to a 10% benchmark-variance tolerance
    assert ch["poses_per_sec"] > 0.9 * i8["poses_per_sec"]

    c_bf16 = rows["completion pc-1000 bf16"]["mpjpe"]
    c_chan = rows["completion pc-1000 int8-chan"]["mpjpe"]
    assert c_chan < 1.05 * c_bf16, (c_chan, c_bf16)
    assert c_chan < rows["completion pc-1000 int8+bf16-tail-200"]["mpjpe"]

    # few-step bpd tail closed (bf16 twins from the main artifact --
    # quality is same-seed deterministic across the two sessions, speed
    # is not, so only quality crosses files). These r4 artifacts predate
    # the recorded protocol block; when both carry one, assert the seeds
    # actually match before comparing across files (regenerated artifacts
    # always carry it -- see the r5 unified test, which pins the same
    # relation within ONE file and supersedes this cross-file check).
    chan_all = json.load(open(os.path.join(base, "quality_vs_nfe_chan.json")))
    main_all = json.load(open(os.path.join(base, "quality_vs_nfe.json")))
    if "protocol" in chan_all or "protocol" in main_all:
        assert chan_all.get("protocol") == main_all.get("protocol"), \
            "cross-file few-step comparison requires identical protocols"
    for n in (50, 20, 10):
        gap = (rows[f"ddim-{n} int8-chan"]["bpd"]
               - main[f"ddim-{n} bf16"]["bpd"])
        assert 0.0 < gap < 0.25, (n, gap)


def test_quality_vs_nfe_r5_unified_pins():
    """Pin the round-5 UNIFIED serving table: every mode (generation +
    completion, bf16/int8/int8-mixed/int8-chan, pc/ddim/dpm/hybrid)
    measured in ONE session on the pinned 400k checkpoint with one seed
    set and best-of-N timing (VERDICT r4 item 4 — the r4 tables spanned
    three sessions whose pc-1000 bf16 rates disagreed by 28%).

    Every serving-guidance claim PERFORMANCE.md derives from the table is
    asserted here against the committed artifact, same-file:

    - dpm-20/ddim-50 hold full-schedule APD; all bf16 modes score
      data-class bpd;
    - int8 twins: APD within 5%, the per-tensor few-step bpd tail, the
      per-channel fix (gap < 0.25 SAME-session — this pin supersedes the
      r4 cross-file comparison);
    - completion: per-tensor int8 degrades (>1.2x), int8-chan holds
      (<5%); pure few-step imputation degrades ~1.7-2x (the measured
      negative result motivating the hybrid); the hybrid DDIM-head +
      exact-pc-tail rows recover pc-level MPJPE at 4-25x fewer NFE.
    """
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "protocols_r5", "quality_vs_nfe_r5.json")
    data = json.load(open(path))
    assert data["protocol"]["time_reps"] >= 2  # stall-robust timing
    rows = {r["mode"]: r for r in data["rows"]}

    pc = rows["pc-1000 bf16"]
    assert 0.85 < pc["apd"] < 0.96, pc["apd"]
    assert abs(rows["dpm-20 (xla)"]["apd"] - pc["apd"]) / pc["apd"] < 0.05
    assert abs(rows["ddim-50 bf16"]["apd"] - pc["apd"]) / pc["apd"] < 0.01
    for mode in ("ddim-50 bf16", "ddim-20 bf16", "ddim-10 bf16",
                 "dpm-20 (xla)", "dpm-10 (xla)"):
        assert abs(rows[mode]["bpd"] - pc["bpd"]) < 0.45, (mode, rows[mode])

    for n in (50, 20, 10):
        b16, i8, ch = (rows[f"ddim-{n} bf16"], rows[f"ddim-{n} int8"],
                       rows[f"ddim-{n} int8-chan"])
        assert abs(i8["apd"] - b16["apd"]) / b16["apd"] < 0.05
        assert 0.0 < i8["bpd"] - b16["bpd"] < 4.0      # per-tensor tail
        assert 0.0 < ch["bpd"] - b16["bpd"] < 0.25     # per-channel fix
    ch = rows["pc-1000 int8-chan"]
    assert abs(ch["apd"] - pc["apd"]) / pc["apd"] < 0.02
    assert abs(ch["bpd"] - pc["bpd"]) < 0.05

    c_pc = rows["completion pc-1000 bf16"]["mpjpe"]
    assert rows["completion pc-1000 int8"]["mpjpe"] > 1.2 * c_pc
    assert rows["completion pc-1000 int8-chan"]["mpjpe"] < 1.05 * c_pc
    # pure few-step imputation: the measured negative result
    for n in (50, 20, 10):
        assert rows[f"completion ddim-{n} bf16"]["mpjpe"] > 1.5 * c_pc
    # plain-EM-tail hybrids: better than every pure few-step mode at
    # comparable NFE, monotone-improving in tail length, but saturating
    # ~12% above pc — the measured finding that led to the langevin tail
    h = {m: rows[f"completion hybrid-{m} bf16"]["mpjpe"]
         for m in ("25+500", "25+300", "25+200", "25+100", "25+50",
                   "10+25")}
    assert h["25+100"] < rows["completion ddim-50 bf16"]["mpjpe"]
    assert h["25+500"] <= h["25+300"] <= h["25+200"] <= h["25+100"] \
        <= h["25+50"]
    assert h["25+500"] > 1.1 * c_pc  # plain-EM tails saturate high
    # the langevin-tail hybrid is the serving mode: at NFE 225 it beats
    # the plain 200-row tail (same NFE) AND every longer plain tail, and
    # lands within 5% of the full 1000-row protocol at 4.4x fewer evals
    lgv = rows["completion hybrid-lgv-25+100 bf16"]["mpjpe"]
    assert lgv < h["25+200"] and lgv < h["25+500"], (lgv, h)
    assert lgv < 1.05 * c_pc, (lgv, c_pc)
    # longer lgv tails overtake the protocol outright...
    assert rows["completion hybrid-lgv-25+200 bf16"]["mpjpe"] < c_pc
    assert rows["completion hybrid-lgv-25+400 bf16"]["mpjpe"] \
        < rows["completion hybrid-lgv-25+200 bf16"]["mpjpe"]
    # ...and the control shows the win is NFE REALLOCATION, not langevin
    # itself: the full schedule + langevin (2000 evals) is no better than
    # the corrector-free protocol and loses to lgv-25+400 at 2.4x evals
    ctrl = rows["completion pc-1000+lgv bf16"]["mpjpe"]
    assert ctrl > 0.99 * c_pc, (ctrl, c_pc)
    assert rows["completion hybrid-lgv-25+400 bf16"]["mpjpe"] < ctrl

    # generation: the same mode reproduces the full protocol's sample
    # DISTRIBUTION (bpd within 0.02, APD within 2%) at 4.4x fewer evals
    g = rows["hybrid-lgv-25+100 bf16"]
    assert abs(g["bpd"] - pc["bpd"]) < 0.02, (g["bpd"], pc["bpd"])
    assert abs(g["apd"] - pc["apd"]) / pc["apd"] < 0.02, g["apd"]


def test_reference_parity_likint_artifact_pins():
    """Pin the round-5 likelihood/interpolation cross-framework parity
    artifact (VERDICT r4 item 1 — the last two reference protocol
    families): the reference's own get_likelihood_fn (scipy RK45, torch,
    exported .pth) ran next to this framework's likelihood paths on a
    shared pose batch, and the interpolation protocol's encode/decode was
    compared cross-framework. Regenerate with
    benchmarks/reference_parity.py --protocol likelihood,interpolation."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "protocols_r5", "reference_parity_likint.json")
    d = json.load(open(path))

    lik = d["likelihood"]
    # cross-framework bpd within the fused-kernel's documented tolerance
    # band (0.05 bits/dim); ours adaptive vs fast RK4 agree much tighter
    assert abs(lik["bpd_ours_adaptive"] - lik["bpd_reference"]) < 0.05
    assert abs(lik["bpd_ours_rk4"] - lik["bpd_ours_adaptive"]) < 0.005
    # both frameworks encode to the SAME latent (the ODE is shared)
    assert lik["latent_mean_abs_delta"] < 5e-3
    # the delta is small vs the batch's own bpd spread
    assert abs(lik["bpd_ours_adaptive"] - lik["bpd_reference"]) \
        < 0.2 * lik["bpd_std_reference"]

    itp = d["interpolation"]
    # encode->decode ~ identity in both frameworks
    assert itp["round_trip_ref"] < 0.01 and itp["round_trip_ours"] < 0.01
    # cross-framework: same latents, same decodes (sub-0.5% rel)
    assert itp["latent_rel_delta_pct"] < 0.5
    assert itp["cross_decode_rel_pct"] < 0.5
    # the slerp path decodes stably for (nearly) every frame
    assert itp["slerp_stable_frames"] >= itp["slerp_frames"] - 1
