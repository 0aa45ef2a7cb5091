from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.models.discriminator import Discriminator
from aas_enhancement_tpu.models.enhancer import (Enhancer, apply_enhancement,
                                                 enhanced_log_mag)

__all__ = ["AcousticModel", "Discriminator", "Enhancer", "apply_enhancement",
           "enhanced_log_mag"]
