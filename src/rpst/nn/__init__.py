from .blocks import (
    Conv2dBlock,
    PadConv,
    torch_conv_kernel_init,
    torch_conv_bias_init,
    rp_deeper_dims,
    rp_constant_dims,
    rp_shallower_dims,
    rp_increase_dims,
    rp_decrease_dims,
    RPStack,
    RPSequence,
)
from .vgg import VGG19Encoder, load_vgg_params
from .decoder import VGGMirrorDecoder

__all__ = [
    "Conv2dBlock", "PadConv", "torch_conv_kernel_init", "torch_conv_bias_init",
    "rp_deeper_dims", "rp_constant_dims", "rp_shallower_dims",
    "rp_increase_dims", "rp_decrease_dims", "RPStack", "RPSequence",
    "VGG19Encoder", "load_vgg_params", "VGGMirrorDecoder",
]
