"""lewton_tpu — a TPU-native Ogg/Vorbis decode framework.

Public API (mirrors the reference lewton's surface, lewton src/lib.rs:16-21):

- high-level stream API: :class:`OggStreamReader`, :func:`read_headers`
- low-level per-packet API: :func:`read_header_ident` /
  :func:`read_header_comment` / :func:`read_header_setup` +
  :func:`read_audio_packet` / :func:`read_audio_packet_generic`
- serving: :class:`~lewton_tpu.serve.StreamingScheduler`,
  :class:`~lewton_tpu.parallel.BatchDecoder`
- errors: :class:`VorbisError` hierarchy
"""

from .audio import (  # noqa: F401
    PreviousWindowRight,
    get_decoded_sample_count,
    read_audio_packet,
    read_audio_packet_generic,
)
from .errors import (  # noqa: F401
    AudioBadFormat,
    AudioIsHeader,
    BadHeader,
    HeaderIsAudio,
    NotVorbisHeader,
    OggError,
    VorbisError,
)
from .header import (  # noqa: F401
    CommentHeader,
    HeaderSet,
    IdentHeader,
    SetupHeader,
    read_header_comment,
    read_header_ident,
    read_header_setup,
)
from .inside_ogg import OggStreamReader, read_headers  # noqa: F401
from .ogg import Packet, PacketReader  # noqa: F401

__version__ = "0.1.0"
