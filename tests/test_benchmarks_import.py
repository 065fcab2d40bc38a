"""benchmarks/run.py stays importable and its config table is complete."""

import importlib.util
import os


def test_benchmark_suite_importable():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_run", os.path.join(root, "benchmarks", "run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.CONFIGS) == {1, 2, 3, 4}
