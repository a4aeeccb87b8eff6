from .prior import DPoserPrior, one_step_denoise, multi_step_denoise, sample_quan_t
from .completion import DPoserComp
from .motion_denoising import MotionDenoise
from .smplify import DPoser, SMPLify
