from kanzi_tpu.bitstream.writer import BitWriter
from kanzi_tpu.bitstream.reader import BitReader, BitStreamError

__all__ = ["BitWriter", "BitReader", "BitStreamError"]
