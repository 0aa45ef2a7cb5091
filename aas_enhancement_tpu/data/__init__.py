from aas_enhancement_tpu.data.wav import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
