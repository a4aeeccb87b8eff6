from . import metrics, rotations, smoothing
