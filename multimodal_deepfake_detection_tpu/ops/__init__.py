from .conv import (
    conv2d,
    conv2d_init,
    separable_conv2d,
    separable_conv2d_init,
    batch_norm,
    batch_norm_init,
    max_pool2d,
    global_avg_pool,
    linear,
    linear_init,
)
from .lstm import lstm_init, lstm_apply, bilstm_init, bilstm_apply
from .resize import resize_bilinear
