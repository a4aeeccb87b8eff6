from .score_mlp import ScoreModelFC, TimeMLPs, create_score_model
from .time_embedding import get_timestep_embedding, GaussianFourierProjection
