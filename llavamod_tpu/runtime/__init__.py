"""Runtime components around the jitted compute path.

The reference's runtime is DeepSpeed's C++ engine (SURVEY.md §2.9 L0); the
TPU equivalents here are thin by design — XLA owns scheduling/memory — but
the host-side feeding of the chip is ours:

  * prefetch.DevicePrefetcher — overlap host batch assembly + H2D transfer
    with device compute (double buffering).
  * llavamod_tpu.native          — C++ image-preprocessing kernels.
"""

from llavamod_tpu.runtime.prefetch import DevicePrefetcher  # noqa: F401
