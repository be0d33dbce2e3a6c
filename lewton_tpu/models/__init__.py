from .decoder import CompiledSetup, StreamDecoder, compile_setup  # noqa: F401
