from . import rotations, smoothing
