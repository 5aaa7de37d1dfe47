from .io import IOStream, mkdir, save_npy, load_npy, save_torch_tensor
from .rng import set_random, cal_rank

__all__ = ["IOStream", "mkdir", "save_npy", "load_npy", "save_torch_tensor",
           "set_random", "cal_rank"]
