#!/usr/bin/env python
"""Visualize the Colored noise generator across exponents and schedule
positions — the reference's colored_noise_grid.py without needing a VAE.

Usage: python scripts/colored_noise_grid.py [out.png]
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import jax

from skrample_tpu.common import Step
from skrample_tpu.noise import Colored, ColoredProps

EXPONENTS = [-2, -1, 0, 1, 2]
POSITIONS = [None, 0.25, 0.5, 0.75, 1.0]


def main(path: str = "colored_noise_grid.png") -> None:
    fig, axes = plt.subplots(len(EXPONENTS), len(POSITIONS), figsize=(2.2 * len(POSITIONS), 2.2 * len(EXPONENTS)))
    for i, exponent in enumerate(EXPONENTS):
        gen = Colored(
            (128, 128),
            jax.random.PRNGKey(0),
            props=ColoredProps(color_start=exponent, color_end=-exponent, color_curve=1),
        )
        for j, pos in enumerate(POSITIONS):
            step = None if pos is None else Step(max(pos - 0.01, 0), pos)
            img = np.asarray(gen.generate(j, step))
            ax = axes[i][j]
            ax.imshow(img, cmap="gray", vmin=-2.5, vmax=2.5)
            ax.set_xticks([])
            ax.set_yticks([])
            if j == 0:
                ax.set_ylabel(f"exp {exponent:+}")
            if i == 0:
                ax.set_title("t=None" if pos is None else f"t={pos}")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "colored_noise_grid.png")
