from .activations import ActSpec, apply_act, LEAKY, LEAKY_02, TANH, SILU
from .blocks import RDB, RRDB, ResidualBlock, Upsampler
from .conv import ConvBlock, DenseBlock
from .fuse import fuse_conv_bn, split_fused_variables
from .pixel_shuffle import pixel_shuffle, pixel_unshuffle

__all__ = [
    "ActSpec", "apply_act", "LEAKY", "LEAKY_02", "TANH", "SILU",
    "RDB", "RRDB", "ResidualBlock", "Upsampler",
    "ConvBlock", "DenseBlock",
    "fuse_conv_bn", "split_fused_variables",
    "pixel_shuffle", "pixel_unshuffle",
]
