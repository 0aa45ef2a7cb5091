"""aas_enhancement_tpu — TPU-native AAS speech-enhancement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of lifelongeek/AAS_enhancement
(Acoustic and Adversarial Supervision for unpaired speech enhancement, IEEE SPL 2019):
a conv+BLSTM enhancement network trained by backpropagating (a) the CTC loss of a
frozen DeepSpeech2-style acoustic model and (b) a spectrogram-discriminator GAN loss,
with STFT featurization and ISTFT overlap-add reconstruction on-device.

Blueprint: /root/repo/SURVEY.md.  North star: /root/repo/BASELINE.json.
"""

__version__ = "0.1.0"
