"""fpsc_tpu: TPU-native neural speech codec framework.

A from-scratch JAX/XLA/Pallas rebuild of the
Feature-predictor-for-speech-codec reference (see README.md and
PARITY.md for the component map).
"""

__version__ = "0.1.0"
