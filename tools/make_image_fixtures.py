"""Regenerate the committed image fixtures under tests/fixtures/images/.

Deterministic (seeded) so the binaries are reproducible; the ground-truth
metadata the tests assert against is written alongside as fixtures.json.
Run: python tools/make_image_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legate_pandas_spark.operators.multimodal import encode_bmp, encode_png  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "images",
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.RandomState(20260816)
    specs = []
    # one PNG per (mode, filter): gradient/noise content
    for c, mode in ((1, "gray"), (3, "rgb"), (4, "rgba")):
        for ft in range(5):
            h, w = 11, 17
            base = (
                np.add.outer(np.arange(h) * 7, np.arange(w) * 11) % 256
            ).astype(np.uint8)
            px = np.stack([(base + 31 * k) % 256 for k in range(c)], axis=-1).astype(
                np.uint8
            )
            if mode == "gray":
                arr = px[:, :, 0]
            else:
                arr = px
            name = f"{mode}_f{ft}.png"
            data = encode_png(arr, filter_type=ft)
            open(os.path.join(OUT, name), "wb").write(data)
            specs.append(
                {
                    "file": name,
                    "fmt": "png",
                    "width": w,
                    "height": h,
                    "channels": c,
                    "bit_depth": 8,
                    "pixel_sum": int(px[:, :, :c].astype(np.int64).sum()),
                }
            )
    # BMPs with odd widths (row padding) and noise content
    for w, h in ((5, 3), (13, 9), (32, 8)):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        name = f"noise_{w}x{h}.bmp"
        open(os.path.join(OUT, name), "wb").write(encode_bmp(px))
        specs.append(
            {
                "file": name,
                "fmt": "bmp",
                "width": w,
                "height": h,
                "channels": 3,
                "bit_depth": 24,
                "pixel_sum": int(px.astype(np.int64).sum()),
            }
        )
    with open(os.path.join(OUT, "fixtures.json"), "w") as f:
        json.dump(specs, f, indent=1)
    print(f"wrote {len(specs)} fixtures to {OUT}")


if __name__ == "__main__":
    main()
