#!/usr/bin/env python
"""Deep validation sweep: run every fuzz family at N x the CI counts with a
fresh seed space.  One-off soak for release confidence; the CI-tier fuzzes
in tests/ stay small and deterministic.

Usage: python scripts/deep_fuzz.py [multiplier=10] [seed_base=10_000_000]
"""

from __future__ import annotations

import os
import sys
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, ROOT)


def main(multiplier: int = 10, seed_base: int = 10_000_000) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # the compiled-vs-eager family compares against a float64 oracle; under
    # pytest a module-scoped fixture in test_ops enables x64, but this
    # script calls the functions directly, so enable it here
    jax.config.update("jax_enable_x64", True)

    import test_ops as ops_tests
    import test_reference_fuzz as ref_fuzz

    families = [
        ("structured vs reference", ref_fuzz.test_fuzz_structured, 150 * multiplier),
        ("rk vs reference", ref_fuzz.test_fuzz_rk, 40 * multiplier),
        ("schedule tables bit-exact", ref_fuzz.test_schedule_tables_bit_exact_fuzz, 100 * multiplier),
        ("compiled vs eager", ops_tests.test_compiled_vs_eager_fuzz, 60 * multiplier),
    ]
    try:
        import test_reference_wrapper_dual as wrap_dual

        families.append(("wrapper dual-run", wrap_dual.test_wrapper_dual_fuzz, 30 * multiplier))
    except Exception:  # noqa: BLE001 — reference tree absent
        pass

    total_bad = 0
    for name, fn, count in families:
        bad = 0
        first_failure = None
        for i in range(count):
            try:
                fn(seed_base + i)
            except Exception:  # noqa: BLE001 — collect, report, continue
                bad += 1
                if first_failure is None:
                    first_failure = (seed_base + i, traceback.format_exc(limit=3))
        status = "OK " if bad == 0 else "FAIL"
        print(f"{status} {name}: {count - bad}/{count}", flush=True)
        if first_failure:
            print(f"  first failure at seed {first_failure[0]}:\n{first_failure[1]}")
        total_bad += bad
    return 1 if total_bad else 0


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    sys.exit(main(*args))
