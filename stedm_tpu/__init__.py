"""STEDM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
OettlM/STEDM ("Style-Extracting Diffusion Models", ECCV 2024).

Built from scratch for TPU hardware: channels-last layouts, `lax.scan` samplers with
batched classifier-free-guidance passes, pjit data parallelism over a device mesh, and
Pallas kernels on the hot paths. The reference implementation (PyTorch-Lightning) is
documented in SURVEY.md; reference file:line citations appear in docstrings throughout
this package so parity can be audited.
"""

__version__ = "0.1.0"
