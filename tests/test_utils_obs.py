"""Observability utils: ResultsWriter artifacts + profiling registry.

The reference's `plots=True` writes per-epoch results tables and curve
images (`Train_OBB.py:811, 839`); the stage-timer registry feeds the
bench's stage_ms breakdown. Small modules, but they are public run
artifacts — pin their shape.
"""

import csv
import os
import time

from oriented_object_detection_tpu.utils import profiling as prof
from oriented_object_detection_tpu.utils.plots import ResultsWriter


class TestResultsWriter:
    def test_csv_rows_and_plot(self, tmp_path):
        run = str(tmp_path / "run")
        w = ResultsWriter(run, plots=True)
        for e in range(3):
            w.append(epoch=e, loss=10.0 - e, box=1.0, cls=2.0, dfl=0.5,
                     fitness=0.1 * e, lr=0.003)
        with open(os.path.join(run, "results.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3
        assert rows[0]["epoch"] == "0" and rows[2]["fitness"] == "0.2"
        assert list(rows[0].keys()) == ResultsWriter.FIELDS
        # curve image appears once >= 2 epochs exist (matplotlib is in
        # this image; if it ever goes missing the writer must not crash)
        try:
            import matplotlib  # noqa: F401
            assert os.path.exists(os.path.join(run, "results.png"))
        except ImportError:
            pass

    def test_missing_fields_blank_not_crash(self, tmp_path):
        w = ResultsWriter(str(tmp_path), plots=False)
        w.append(epoch=0, loss=1.0)  # no fitness/lr
        with open(w.csv_path) as f:
            row = list(csv.DictReader(f))[0]
        assert row["fitness"] == "" and row["lr"] == ""


class TestProfiling:
    def test_timed_report_reset(self):
        prof.reset()
        with prof.timed("stage/a"):
            time.sleep(0.01)
        with prof.timed("stage/a"):
            pass
        with prof.timed("stage/b"):
            pass
        rep = prof.report()
        assert rep["stage/a"]["calls"] == 2
        assert rep["stage/a"]["total_s"] >= 0.01
        assert "stage/b" in rep
        prof.reset()
        assert prof.report() == {}

    def test_disabled_records_nothing(self):
        prof.reset()
        prof.enable(False)
        try:
            with prof.timed("stage/off"):
                pass
        finally:
            prof.enable(True)
        assert "stage/off" not in prof.report()
