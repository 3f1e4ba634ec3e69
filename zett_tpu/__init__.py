"""zett_tpu — a TPU-native Zero-Shot Tokenizer Transfer framework.

Re-implements the capabilities of bminixhofer/zett from scratch for TPU:
JAX/XLA/Pallas compute path, native C++ host tokenization, GSPMD sharding
over named meshes.
"""

__version__ = "0.1.0"
