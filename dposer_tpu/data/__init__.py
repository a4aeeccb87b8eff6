from .amass import AMASSDataset, PoseNormalizer, Posenormalizer, N_POSES
