from . import incremental, ingest  # noqa: F401
from .incremental import StreamingER  # noqa: F401
