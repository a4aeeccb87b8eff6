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
      and bpd within 0.05 (plain per-tensor int8: 4.4% / +0.37) — and at
      least as fast as plain int8 (same kernel, scales folded into the
      weights);
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
    # folding scales into the weights costs nothing at serving time
    assert ch["poses_per_sec"] > 0.9 * i8["poses_per_sec"]

    c_bf16 = rows["completion pc-1000 bf16"]["mpjpe"]
    c_chan = rows["completion pc-1000 int8-chan"]["mpjpe"]
    assert c_chan < 1.05 * c_bf16, (c_chan, c_bf16)
    assert c_chan < rows["completion pc-1000 int8+bf16-tail-200"]["mpjpe"]

    # few-step bpd tail closed (bf16 twins from the main artifact --
    # quality is same-seed deterministic across the two sessions, speed
    # is not, so only quality crosses files)
    for n in (50, 20, 10):
        gap = (rows[f"ddim-{n} int8-chan"]["bpd"]
               - main[f"ddim-{n} bf16"]["bpd"])
        assert 0.0 < gap < 0.25, (n, gap)
