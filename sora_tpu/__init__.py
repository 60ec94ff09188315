"""sora_tpu — a TPU-native 802.11a/b/n software PHY (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of Microsoft Sora
(reference: /root/reference, see SURVEY.md) for TPU hardware:

* Sora's BRICK dataflow graphs (kernel/brick/inc/brick.h) become pure JAX
  function composition over batched sample blocks, fused by XLA.
* Sora's SSE LUT vectorization (kernel/core/inc/vector128.h) becomes
  VPU/MXU vectorization: the 64-point FFT is a DFT matmul on the MXU,
  the Viterbi ACS is a butterfly-structured vector min-add on the VPU.
* Sora's core-dedicated threads (kernel/core/src/_scheduler_u.c) become
  jit-compiled pipelines with async dispatch; scaling is sharding over a
  `jax.sharding.Mesh` instead of per-core pipeline threads.

Subpackages
-----------
dsp       core DSP ops: FFT, filters, CRC, scrambling, coding, Viterbi
phy       802.11a/b/n modulation/demodulation chains
io        Sora dump-file I/O and sample sources
parallel  mesh/sharding utilities, halo-exchange block pipelines
ops       Pallas TPU kernels for the hot ops
golden    pure-numpy golden models used as test oracles
mac       frame build/parse + CSMA-lite dispatch loop
util      profiling (real-time-ratio stopwatch), config
"""

__version__ = "0.1.0"
