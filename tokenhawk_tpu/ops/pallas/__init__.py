"""Pallas TPU kernels (the hot path).

The reference's hand-written WGSL shaders (/root/reference/th.cpp) map to:

  quant matmul/GEMV  -> qmatmul.py  (vs wgsl_vector_mat_mul_transpose,
                                     /root/reference/th.cpp:2839-2892)
  flash attention    -> flash_attention.py (vs mat_mul+masked_softmax,
                                     /root/reference/th.cpp:396-539,1619-1700)
  flash decode       -> flash_decode.py (vs row_softmax decode path,
                                     /root/reference/th.cpp:1865-1961)
"""

from tokenhawk_tpu.ops.pallas.qmatmul import quant_matmul  # noqa: F401
