#!/usr/bin/env python
"""Plot schedule stacks and sampler trajectories (matplotlib).

Usage:
  python scripts/plot_schedules.py schedules out.png
  python scripts/plot_schedules.py samplers out.png
"""

from __future__ import annotations

import math
import random
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from skrample_tpu import scheduling
from skrample_tpu.sampling import functional, interface, models, structured, tableaux


def plot_schedules(path: str) -> None:
    stacks = {
        "Linear": scheduling.Linear(),
        "FlowShift(Linear)": scheduling.FlowShift(scheduling.Linear()),
        "Scaled": scheduling.Scaled(),
        "ZSNR": scheduling.ZSNR(),
        "Karras(Scaled)": scheduling.Karras(scheduling.Scaled()),
        "Exponential(Scaled)": scheduling.Exponential(scheduling.Scaled()),
        "Beta(Linear)": scheduling.Beta(scheduling.Linear()),
        "Probit(Linear)": scheduling.Probit(scheduling.Linear()),
        "Hyper(Linear)": scheduling.Hyper(scheduling.Linear()),
        "Sinner(Linear)": scheduling.Sinner(scheduling.Linear()),
    }
    t = np.linspace(1, 0, 200)
    fig, (ax_s, ax_a) = plt.subplots(1, 2, figsize=(12, 5))
    for name, schedule in stacks.items():
        points = schedule.points_np(t)
        ax_s.plot(1 - t, points[:, 1], label=name, linewidth=1.2)
        ax_a.plot(1 - t, points[:, 2], linewidth=1.2)
    ax_s.set_title("sigma over inference time")
    ax_a.set_title("alpha over inference time")
    ax_s.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


def plot_samplers(path: str) -> None:
    samplers = {
        "Euler": structured.Euler(),
        "DPM(2)": structured.DPM(order=2),
        "DPM(2,sde)": structured.DPM(order=2, stochasticity=1),
        "UniPC(2)": structured.UniPC(order=2),
        "Adams(4)": structured.Adams(order=4),
        "RKUltra(4)": functional.RKUltra(order=4),
        "DynasauRK(3)": functional.DynasauRK(order=3),
    }
    schedule = scheduling.FlowShift(scheduling.Linear())
    steps = 30

    fig, ax = plt.subplots(figsize=(9, 5))
    for name, sampler in samplers.items():
        trajectory: list[float] = []
        random.seed(0)
        adapter = (
            interface.StructuredFunctionalAdapter(sampler)
            if isinstance(sampler, structured.StructuredSampler)
            else sampler
        )
        adapter.generate_model(
            lambda x, t, s, a: x - math.sin(t / 300),
            models.FlowModel(),
            schedule,
            lambda _: random.gauss(),
            steps,
            callback=lambda x, i, d: trajectory.append(x),
        )
        ax.plot(trajectory, label=name, linewidth=1.2, marker=".", markersize=3)
    ax.set_title("scalar trajectories, x - sin(t/300) toy model")
    ax.set_xlabel("step")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "schedules"
    out = sys.argv[2] if len(sys.argv) > 2 else f"{mode}.png"
    {"schedules": plot_schedules, "samplers": plot_samplers}[mode](out)
