from .torch_port import (
    xception_params_from_torch,
    lstm_params_from_torch,
    linear_params_from_torch,
    conv_w,
    depthwise_w,
)
