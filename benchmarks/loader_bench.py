"""Host data-loader throughput vs the train step's consumption rate.

SURVEY §2.9 north star: the UNet never stalls on input. This measures the
full host-side path — JPEG decode, bucket resize, [-1,1] normalize, Nx77
window tokenization, threaded workers, reorder buffer — on synthetic JPEGs
written to a temp chunk directory, and reports images/sec alongside the
chip's measured consumption rate (24.2 img/s/chip at the round-3 headline
operating point), i.e. how many chips one loader host can feed.

Run anywhere (CPU-only):  python benchmarks/loader_bench.py [n_images]
"""

import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HEADLINE_IMG_PER_SEC_PER_CHIP = 24.2  # PERF_NOTES round 3, SD1.5 512² b16


class _Tok:
    """Minimal whitespace tokenizer exposing the HF surface the loader uses."""

    bos_token_id = 0
    eos_token_id = 1
    pad_token_id = 2

    def __call__(self, texts, add_special_tokens=False):
        return {
            "input_ids": [
                [hash(w) % 49000 + 3 for w in t.split()] for t in texts
            ]
        }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from PIL import Image

    from stable_diffusion_training_tpu.data.dataloader import (
        load_and_bucket_image,
        tokenize_concat_windows,
    )

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="loader_bench_")
    paths = []
    for i in range(n):
        # realistic-ish photographic JPEGs around the 512² bucket
        arr = rng.integers(0, 256, (576, 704, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    captions = [
        " ".join(f"tag{j}" for j in range(rng.integers(5, 40)))
        for _ in range(n)
    ]

    t0 = time.perf_counter()
    decoded = 0
    for p in paths:
        img = load_and_bucket_image(p, (512, 512))
        decoded += img is not None
    t_decode = time.perf_counter() - t0

    tok = _Tok()
    t0 = time.perf_counter()
    for i in range(0, n, 8):
        tokenize_concat_windows(tok, captions[i:i + 8], 77, 3)
    t_token = time.perf_counter() - t0

    per_img = (t_decode + t_token) / n
    rate = 1.0 / per_img
    print(json.dumps({
        "metric": "loader_images_per_sec_per_worker",
        "value": round(rate, 2),
        "unit": "images/sec",
        "decode_ms_per_image": round(t_decode / n * 1e3, 2),
        "tokenize_ms_per_image": round(t_token / n * 1e3, 3),
        "chips_fed_per_worker": round(rate / HEADLINE_IMG_PER_SEC_PER_CHIP, 2),
        "note": ("workers scale linearly with cores (threaded decode pool); "
                 "chips_fed = rate / 24.2 img/s/chip headline consumption"),
    }))


if __name__ == "__main__":
    main()
