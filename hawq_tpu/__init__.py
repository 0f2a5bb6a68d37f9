"""hawq_tpu — TPU-native integer-only quantization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of Zhen-Dong/HAWQ
(HAWQ-V3): integer-only dyadic quantization-aware training and inference for
CNNs at uniform W8A8/W4A4 and Hessian/ILP-driven mixed precision, with Pallas
int8/int4 kernels and multi-host pjit serving replacing the reference's
PyTorch + TVM/CUDA-tensor-core stack.  See SURVEY.md for the structural map.
"""

__version__ = '0.1.0'
