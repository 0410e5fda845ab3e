"""Multi-chip block parallelism.

The reference's parallel model is pure block data-parallelism: independent
blocks fan out to worker threads and commit to the shared bitstream in
block order (src/io/CompressedOutputStream.cpp:476-546,835-868, SURVEY
§2.9). The TPU-native equivalent: a 1-D device mesh over the "block" axis;
each device encodes its shard of 16 KiB entropy chunks, the host gathers
(variable-length payloads + lengths) and performs the ordered concat the
reference does with its atomic processedBlockId protocol.
"""

from kanzi_tpu.parallel.mesh import (block_mesh, shard_ans0_encode,
                                     shard_ans0_decode)

__all__ = ["block_mesh", "shard_ans0_encode", "shard_ans0_decode"]
