"""JPEG decode throughput bench (no Spark): 1k synthetic baseline JPEGs
(textured gray + 4:2:0 color + restart-marker variants) through
titanlib_spark.textops.multimodal.decode_jpeg.

Prints images/s and an md5 over all decoded pixels — run before and after
a decoder change to prove outputs are byte-identical while measuring the
speedup (OPTIMIZATION_r06.md evidence; VERDICT r05 item 2).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_jpeg import jpeg_encode_420, jpeg_encode_gray  # noqa: E402

from titanlib_spark.textops.multimodal import decode_jpeg  # noqa: E402

N = int(os.environ.get("JPEG_BENCH_N", "1000"))


def make_corpus(n: int) -> list[bytes]:
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        kind = i % 4
        if kind == 0:  # textured gray 64x64
            pix = rng.integers(0, 256, (64, 64), dtype=np.uint8)
            out.append(jpeg_encode_gray(pix))
        elif kind == 1:  # smooth gray 64x64 (short AC runs)
            gx = np.linspace(0, 255, 64)
            pix = np.clip(np.add.outer(gx, gx) / 2 + rng.normal(0, 4, (64, 64)), 0, 255).astype(np.uint8)
            out.append(jpeg_encode_gray(pix))
        elif kind == 2:  # 4:2:0 color 32x32
            rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            out.append(jpeg_encode_420(rgb))
        else:  # gray with restart markers
            pix = rng.integers(0, 256, (32, 32), dtype=np.uint8)
            out.append(jpeg_encode_gray(pix, restart=4))
    return out


def main() -> None:
    batch_mode = "--batch" in sys.argv
    corpus = make_corpus(N)
    total_bytes = sum(len(p) for p in corpus)
    # warm-up (table caches, JIT-free python: just allocator warmth)
    decode_jpeg(corpus[0])
    h = hashlib.md5()
    t0 = time.time()
    if batch_mode:
        from titanlib_spark.textops.multimodal import decode_jpeg_batch

        for img in decode_jpeg_batch(corpus):
            assert img is not None
            h.update(img.tobytes())
    else:
        for p in corpus:
            img = decode_jpeg(p)
            assert img is not None
            h.update(img.tobytes())
    dt = time.time() - t0
    mode = "batch" if batch_mode else "serial"
    print(
        f"mode={mode} images={N} wall={dt:.2f}s rate={N/dt:.1f} img/s "
        f"({total_bytes/dt/1e6:.2f} MB/s compressed) pixel_md5={h.hexdigest()}"
    )


if __name__ == "__main__":
    main()
