from aas_enhancement_tpu.decode.beam import beam_decode
from aas_enhancement_tpu.decode.greedy import decode_batch, greedy_decode
from aas_enhancement_tpu.decode.wer import cer, corpus_wer, edit_distance, wer

__all__ = ["beam_decode", "cer", "corpus_wer", "decode_batch", "edit_distance",
           "greedy_decode", "wer"]
