"""802.11b DSSS PHY — JAX device chains (TX + RX).

Reference: kernel/bb/Brick11/src/PHY_11b.hpp and the fb11b*_config.hpp
graphs; golden numpy model in sora_tpu.golden.dot11b_np.
"""

from sora_tpu.phy.dot11b import rx, tx  # noqa: F401
