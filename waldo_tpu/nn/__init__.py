from .transform import (
    Mlp,
    CustomNorm,
    Block,
    MultiBlocks,
    FullAttention,
    CrossAttention,
    ObjAttention,
    ClsAttention,
)
from .conv import UNet, ConvPatchProj
from .init import trunc_normal_init, dense_kwargs, conv_kwargs
