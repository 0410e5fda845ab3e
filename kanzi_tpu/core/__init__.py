from kanzi_tpu.core.context import Context
from kanzi_tpu.core.errors import Error, KanziError

__all__ = ["Context", "Error", "KanziError"]
