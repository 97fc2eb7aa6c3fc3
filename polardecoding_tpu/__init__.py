"""polardecoding_tpu — TPU-native polar-code Monte-Carlo decoding framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the C reference
CHEBSB/PolarDecoding (see SURVEY.md): batched polar encode, BPSK/AWGN channel,
BP / SC / SCL / CA-SCL decoders, BPr instrumentation, DE-GA analysis, and a
sharded adaptive Monte-Carlo sweep harness.
"""
from polardecoding_tpu.configs import PRESETS, CodeConfig, DecoderConfig, Preset, SweepConfig, preset

__all__ = [
    "PRESETS",
    "preset",
    "Preset",
    "CodeConfig",
    "DecoderConfig",
    "SweepConfig",
]

__version__ = "0.1.0"
