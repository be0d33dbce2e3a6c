"""Device-side (JAX/XLA/Pallas) numeric ops for the Vorbis synthesis half.

Each op is a pure function over statically-shaped arrays, batched over
packets (and, one level up, over streams). The host entropy front-end
(`lewton_tpu.audio.decode_packet_entropy`) produces the dense inputs.
"""

from .floor_curve import floor0_curve_batch, floor1_curve_batch  # noqa: F401
from .coupling import inverse_coupling_batch  # noqa: F401
from .imdct import imdct_batch  # noqa: F401
from .windowing import overlap_add_batch  # noqa: F401
