"""Transform chain with per-stage skip flags.

Mirrors TransformSequence<T> (src/transform/TransformSequence.hpp:88-247):
up to 8 stages run in order; a stage whose forward fails is recorded in an
8-bit skip mask (bit (7-i) CLEAR means stage i ran; SKIP_MASK=0xFF means
nothing ran). The inverse runs un-skipped stages in reverse.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from kanzi_tpu.transform.base import ByteTransform, as_u8

SKIP_MASK = 0xFF


class TransformSequence:
    def __init__(self, transforms: List[ByteTransform]):
        if not 1 <= len(transforms) <= 8:
            raise ValueError("1..8 transforms required")
        self.transforms = transforms
        self.skip_flags = SKIP_MASK

    def __len__(self) -> int:
        return len(self.transforms)

    def forward(self, src: np.ndarray) -> Optional[np.ndarray]:
        """Apply all stages; returns transformed bytes (skip_flags records
        which stages ran). Returns the input copy if every stage skipped
        (caller checks skip_flags == SKIP_MASK, reference returns false)."""
        data = as_u8(src)
        self.skip_flags = SKIP_MASK
        for i, t in enumerate(self.transforms):
            out = t.forward(data)
            if out is None:
                continue  # stage skipped, flag bit stays set
            self.skip_flags &= ~(1 << (7 - i)) & 0xFF
            data = out
        return data

    def inverse(self, src: np.ndarray) -> np.ndarray:
        data = as_u8(src)
        if self.skip_flags == SKIP_MASK:
            return data.copy()
        for i in range(len(self.transforms) - 1, -1, -1):
            if self.skip_flags & (1 << (7 - i)):
                continue
            data = self.transforms[i].inverse(data)
        return data

    def max_encoded_length(self, src_len: int) -> int:
        required = src_len
        for t in self.transforms:
            nxt = t.max_encoded_length(required)
            if nxt > required:
                required = nxt
        return required
