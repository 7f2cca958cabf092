from .xception import xception_init, xception_apply, XCEPTION_BLOCK_SPECS
from .quant import (
    calibrate_amax,
    quantize_folded_xception,
    quantize_xception,
    quantized_xception_apply,
)
from .heads import (
    xception_lstm_init,
    xception_lstm_features,
    xception_lstm_head_apply,
    arcface_init,
    arcface_apply,
    embed_head_init,
    embed_head_apply,
)
