from aas_enhancement_tpu.dsp.stft import (
    frame_signal,
    get_window,
    istft,
    log_magnitude_features,
    magnitude,
    num_frames,
    phase,
    reconstruct,
    stft,
)

__all__ = [
    "frame_signal", "get_window", "istft", "log_magnitude_features",
    "magnitude", "num_frames", "phase", "reconstruct", "stft",
]
