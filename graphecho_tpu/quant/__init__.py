from graphecho_tpu.quant.ptq import (  # noqa: F401
    QuantizedBackbone,
    fold_bn,
    quantize_fpn_backbone,
)
