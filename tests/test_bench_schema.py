"""bench.py attribution-schema regression (VERDICT r03 next #1/#7).

The driver's BENCH_r{N}.json is the scoring artifact; these tests pin the
fields that make a capture self-attributing — device-busy ms/img, per-image
sync count, measured transport RTT vs a recorded baseline, min/median over
>=5 iters, and a WEATHER flag — so a weather-hit capture is distinguishable
from a code regression by reading the artifact alone.
"""

import importlib.util
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REQUIRED_FIELDS = (
    "e2e_full_pipeline_p50_ms",
    "e2e_full_pipeline_min_ms",
    "e2e_iters",
    "e2e_sketches_per_sec_per_chip",
    "e2e_sweep_sketches_per_sec_per_chip",
    "e2e_sweep_best_sketches_per_sec_per_chip",
    "syncs_per_img",
    "device_busy_ms_per_img",
    "rtt_ms",
    "rtt_baseline_ms",
    "host_load_1m",
    "weather",
)


def test_e2e_fields_schema(bench):
    fields = bench.assemble_e2e_fields(
        times_ms=[500.0, 480.0, 510.0, 495.0, 505.0],
        sweep_ts_s=[1.9, 2.0, 1.8], n_sweep=4,
        syncs_per_img=3.0, busy_ms_per_img=174.2, rtt_ms=30.0)
    for key in REQUIRED_FIELDS:
        assert key in fields, key
    assert fields["e2e_iters"] == 5
    assert fields["e2e_full_pipeline_min_ms"] == 480.0
    assert fields["e2e_full_pipeline_p50_ms"] == 500.0
    assert fields["e2e_sweep_sketches_per_sec_per_chip"] == round(4 / 1.9, 3)
    assert fields["e2e_sweep_best_sketches_per_sec_per_chip"] == round(4 / 1.8, 3)
    assert fields["weather"] == "OK"


def test_weather_flag_rtt_excess(bench):
    """RTT above the recorded baseline band -> WEATHER, visible in the JSON."""
    flag = bench.weather_flag(60.0, [500.0, 505.0])
    assert flag.startswith("WEATHER:")
    assert "rtt" in flag


def test_weather_flag_iter_spread(bench):
    """>1.4x max/min spread across timed iters -> WEATHER."""
    flag = bench.weather_flag(25.0, [400.0, 700.0, 420.0])
    assert flag.startswith("WEATHER:")
    assert "spread" in flag


def test_weather_flag_quiet_capture(bench):
    assert bench.weather_flag(28.0, [480.0, 490.0, 500.0]) == "OK"


def test_weather_flag_busy_host(bench):
    """Host CPU load above half the core count -> WEATHER (host-side PNG/NMS
    work inflates under contention with RTT unchanged)."""
    import os

    flag = bench.weather_flag(25.0, [500.0, 505.0],
                              host_load=float((os.cpu_count() or 1) + 2))
    assert flag.startswith("WEATHER:")
    assert "host load" in flag
    # the bench's own ~1-core load never trips the flag
    assert bench.weather_flag(25.0, [500.0, 505.0], host_load=0.9) == "OK"


def test_busy_none_tolerated(bench):
    """A capture where the profiler trace failed still carries the field
    (null), never drops it."""
    fields = bench.assemble_e2e_fields(
        times_ms=[500.0] * 5, sweep_ts_s=[2.0] * 3, n_sweep=4,
        syncs_per_img=3, busy_ms_per_img=None, rtt_ms=30.0)
    assert fields["device_busy_ms_per_img"] is None


def test_inpaint_and_blob_probe_fields_present(bench):
    """Round-5 artifact additions (VERDICT r04 next #4/#7): the inpainting
    stage and the realistic-mask probe must be driver-visible."""
    import inspect

    # measure_inpaint returns the two inpaint fields
    src = inspect.getsource(bench.measure_inpaint)
    assert "inpaint_ms_per_sample" in src
    assert "inpaint_batch4_scaling" in src
    # the blob probe returns busy/cc-cap fields for realistic content
    src = inspect.getsource(bench._blob_probe)
    for key in ("e2e_blob_probe_p50_ms", "device_busy_ms_per_img_blob",
                "cc_cap_hits_per_img_blob"):
        assert key in src, key
    # main() wires both into the artifact
    src = inspect.getsource(bench.main)
    assert "measure_inpaint" in src
