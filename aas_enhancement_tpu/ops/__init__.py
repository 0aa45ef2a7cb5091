from aas_enhancement_tpu.ops.ctc import ctc_loss, ctc_loss_mean
from aas_enhancement_tpu.ops.masking import (apply_time_mask, conv_out_length,
                                             masked_mean, masked_normalize,
                                             time_mask)
from aas_enhancement_tpu.ops.norm import MaskedGroupNorm
from aas_enhancement_tpu.ops.rnn import BiRNN

__all__ = [
    "BiRNN", "MaskedGroupNorm", "apply_time_mask", "conv_out_length",
    "ctc_loss", "ctc_loss_mean", "masked_mean", "masked_normalize", "time_mask",
]
