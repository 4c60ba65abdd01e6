from .denoiser import Denoiser
from .discriminator import Discriminator, adaptive_avg_pool
from .fast import FastDenoiser, FastResBlock, FastSRGenerator
from .generator import SRGenerator
from .vgg import TruncatedVGG19, convert_torch_vgg19, init_vgg_params, load_vgg19_npz

__all__ = [
    "Denoiser",
    "Discriminator",
    "adaptive_avg_pool",
    "FastDenoiser",
    "FastResBlock",
    "FastSRGenerator",
    "SRGenerator",
    "TruncatedVGG19",
    "convert_torch_vgg19",
    "init_vgg_params",
    "load_vgg19_npz",
]
