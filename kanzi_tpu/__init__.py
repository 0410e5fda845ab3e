"""kanzi_tpu — a TPU-native lossless data-compression framework.

A ground-up reimplementation of the capabilities of flanglet/kanzi-cpp
(reference bitstream format version 6, magic "KANZ") designed TPU-first:

- Host orchestration in Python: file/block framing, headers, ordered
  bitstream commit (the reference's CompressedOutputStream/InputStream,
  src/io/CompressedOutputStream.cpp).
- Device compute in JAX/XLA/Pallas: transforms and entropy coding over
  blocks sharded across a `jax.sharding.Mesh` (the reference's
  ThreadPool block data-parallelism, src/concurrent.hpp).

The wire format is bit-exact with the reference: files we produce are
decodable by the reference `kanzi` binary and vice versa.
"""

__version__ = "0.1.0"

BITSTREAM_FORMAT_VERSION = 6  # reference: src/io/CompressedOutputStream.cpp:32
MAGIC = 0x4B414E5A            # "KANZ", reference: src/io/CompressedOutputStream.cpp:31

from kanzi_tpu.io.compressed_stream import (  # noqa: E402,F401
    CompressedWriter,
    CompressedReader,
    compress_bytes,
    decompress_bytes,
)
