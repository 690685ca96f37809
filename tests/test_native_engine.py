"""Native C++ POA engine must be bit-identical to the NumPy oracle."""

import random

import pytest

from racon_tpu.core.window import Window, WindowType
from racon_tpu.poa.consensus import consensus_window


def noisy(s, rate, rng):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))
            out.append(c)
        elif r < rate:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


@pytest.mark.parametrize("trim,wtype", [(True, WindowType.TGS),
                                        (False, WindowType.TGS),
                                        (True, WindowType.NGS)])
def test_native_matches_oracle(trim, wtype):
    rtlib = pytest.importorskip("racon_tpu.native.rtlib")
    rng = random.Random(13)
    windows = []
    for t in range(6):
        true = "".join(rng.choice("ACGT") for _ in range(180))
        bb = noisy(true, 0.12, rng).encode()
        w = Window(0, t, wtype, bb, b"!" * len(bb))
        for _ in range(9):
            if rng.random() < 0.4:
                half = len(bb) // 2
                seg = noisy(true[:90], 0.1, rng).encode()
                q = bytes(rng.randint(34, 73) for _ in range(len(seg)))
                w.add_layer(seg, q, 0, half)
            else:
                seg = noisy(true, 0.1, rng).encode()
                w.add_layer(seg, None, 0, len(bb) - 1)
        windows.append(w)
    # plus a trivial window
    windows.append(Window(0, 99, wtype, b"ACGTACGT", b"!" * 8))

    got = rtlib.polish_windows(windows, 3, -5, -4, trim, num_threads=2)
    for w, (cons, pol) in zip(windows, got):
        rc, rp = consensus_window(w, 3, -5, -4, trim=trim)
        assert pol == rp
        assert cons == rc
