"""Round-3 (cont.): where do the static hr driver's non-update milliseconds
go, and is there tune headroom left in (split-K S, barrier_every)?

Motivation: at 8192² the hr static driver measures 38.7 ms while the update
flops alone at the isolated-update rate (31.9 TFLOP/s, tpu_r3_hr_upd_iso)
account for ~23 ms — ~40% of wall is panels + R copy-outs + barriers. At
16384² the same arithmetic gives ~184 ms of 242. This probe:

  panels  — monkeypatch the trailing update to identity: wall = panel phase
            (CholeskyQR2 grams + POTRF + modified-LU + inverses + T) + R
            copy-outs, no wide W/apply matmuls. (Values downstream differ;
            cost structure per panel is identical — every panel still
            factors an (m-k·nb, nb) window.)
  sN      — _W_SPLITK override (2/4/8): accumulation-vs-fusion tradeoff of
            the split-K wide W projection (shipped S=4, BASELINE.md r3).
  beN     — barrier_every override (the scheduler-window knob; shipped 8).

Usage: python scripts/tpu_r3_hr_tune.py {panels8k|panels16k|s2|s8|be4|be16|base8k|base16k}
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import tileqr.drivers.square_hr as shr  # noqa: E402

from tpu_r3_hr import bench  # noqa: E402


def disable_updates():
    def no_update(y, t, c, prec, dt, trans, interpret=False):
        # keep a data dependence on (y, t) so XLA cannot dead-code the
        # panel factorization (non-zero multiplier — x*0 is foldable),
        # at negligible cost (one rank-0 broadcast-add)
        return c + (y[0, 0] * t[0, 0]).astype(dt) * dt.type(1e-38)
    shr._apply_block_t = no_update


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "base8k"
    if which.startswith("classic"):
        # pre-fused-panel pipeline (the A/B control once "fused" became
        # the default — base8k rows measured before the flip are classic)
        shr._PANEL_PIPELINE = "classic"
        which = which[len("classic"):]
    n = 16384 if which.endswith("16k") else 8192
    ck = 2 if n == 16384 else 3
    if which.startswith("panels"):
        disable_updates()
        bench(n, 256, check=False, chain_k=ck)
    elif which.startswith("s") and which[1].isdigit():
        shr._W_SPLITK = int(which[1])
        bench(n, 256, check=True, chain_k=ck)
    elif which.startswith("be"):
        import functools

        import tpu_r3_hr

        # bench imported qr_hr by value — rebind ITS reference
        tpu_r3_hr.qr_hr = functools.partial(
            shr.qr_hr, barrier_every=int(which[2:])
        )
        bench(n, 256, check=False, chain_k=ck)
    else:
        bench(n, 256, check=True, chain_k=ck)
