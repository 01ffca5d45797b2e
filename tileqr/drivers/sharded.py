"""2D block-cyclic sharded QR driver — stub (SURVEY.md §7.1 step 7)."""

from __future__ import annotations


def qr_sharded(*args, **kwargs):
    raise NotImplementedError("qr_sharded lands in build-plan step 7")
