from .gop import GopParallelEncoder  # noqa: F401
