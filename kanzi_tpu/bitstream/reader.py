"""MSB-first bit reader, mirror of BitWriter.

Reference: src/bitstream/DefaultInputBitStream.{hpp,cpp}. Reading past the
end raises BitStreamError (the reference throws BitStreamException).
"""

from __future__ import annotations

import numpy as np


class BitStreamError(Exception):
    pass


class BitReader:
    __slots__ = ("_data", "_pos", "_nbits")

    def __init__(self, data) -> None:
        self._data = bytes(data)
        self._nbits = 8 * len(self._data)
        self._pos = 0  # bit position

    def read_bit(self) -> int:
        if self._pos >= self._nbits:
            raise BitStreamError("read past end of bitstream")
        b = self._data[self._pos >> 3]
        bit = (b >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self._pos
        if pos + n > self._nbits:
            raise BitStreamError("read past end of bitstream")
        self._pos = pos + n
        first = pos >> 3
        last = (pos + n - 1) >> 3
        chunk = int.from_bytes(self._data[first:last + 1], "big")
        tail = 8 * (last + 1) - (pos + n)
        return (chunk >> tail) & ((1 << n) - 1)

    def read_bytes(self, count: int) -> bytes:
        """Read count whole bytes (any bit alignment)."""
        pos = self._pos
        n = 8 * count
        if pos + n > self._nbits:
            raise BitStreamError("read past end of bitstream")
        self._pos = pos + n
        if (pos & 7) == 0:
            i = pos >> 3
            return self._data[i:i + count]
        r = pos & 7
        i = pos >> 3
        arr = np.frombuffer(self._data, dtype=np.uint8, count=count + 1, offset=i)
        out = ((arr[:-1] << np.uint8(r)) | (arr[1:] >> np.uint8(8 - r))).astype(np.uint8)
        return out.tobytes()

    def tell(self) -> int:
        return self._pos

    def seek(self, bitpos: int) -> None:
        if not (0 <= bitpos <= self._nbits):
            raise BitStreamError("seek out of range")
        self._pos = bitpos

    def remaining(self) -> int:
        return self._nbits - self._pos

    def has_more(self) -> bool:
        return self._pos < self._nbits
