from .sde import SDE, VPSDE, SubVPSDE, VESDE, build_sde
