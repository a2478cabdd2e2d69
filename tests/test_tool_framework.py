"""Tool-framework checkpoint parity: out.properties + --start/--finish.

Covers the reference protocol of itmo:utils/tool/Tool.java:318-390 (dump
out.properties after a stage, reload it when the stage is skipped under
--continue) and :94-101 (--start/--finish stage bounds over addStep steps).
"""
import os

from metacherchant_tpu.tool import Tool, Parameter, ExecutionFailedException


class OutTool(Tool):
    NAME = "out-tool"

    def __init__(self):
        super().__init__()
        self.x = self.add_parameter(Parameter("x", int, default=1))
        self.ran = 0

    def run_impl(self):
        self.ran += 1
        self.add_output("answer", self.x.get(self) * 2)
        self.add_output("resultPath", "graph.txt")


class StepTool(Tool):
    NAME = "step-tool"

    def __init__(self):
        super().__init__()
        self.trace: list[str] = []
        for name in ("alpha", "beta", "gamma"):
            self.add_step(name, lambda n=name: self.trace.append(n))


def test_out_properties_written_and_reloaded_on_skip(tmp_path):
    wd = str(tmp_path / "wd")
    t = OutTool()
    assert t.main(["-w", wd, "--x", "21"]) == 0
    assert t.ran == 1
    out = open(os.path.join(wd, "out.properties")).read()
    assert "tool=out-tool" in out
    assert "answer=42" in out
    assert "resultPath=graph.txt" in out

    # resume: run is skipped, outputs come back from out.properties
    t2 = OutTool()
    assert t2.main(["-w", wd, "--x", "21", "--continue"]) == 0
    assert t2.ran == 0
    assert t2.get_output("answer") == "42"
    assert t2.get_output("resultPath") == "graph.txt"

    # changed inputs invalidate the checkpoint (in.properties mismatch)
    t3 = OutTool()
    assert t3.main(["-w", wd, "--x", "5", "--continue"]) == 0
    assert t3.ran == 1
    assert t3.get_output("answer") == "10"


def test_steps_run_in_order_with_markers(tmp_path):
    wd = str(tmp_path / "wd")
    t = StepTool()
    assert t.main(["-w", wd]) == 0
    assert t.trace == ["alpha", "beta", "gamma"]
    for n in ("alpha", "beta", "gamma"):
        assert os.path.exists(os.path.join(wd, f"SUCCESS.{n}"))
    assert os.path.exists(os.path.join(wd, "SUCCESS"))


def test_start_finish_bounds(tmp_path):
    wd = str(tmp_path / "wd")
    t = StepTool()
    assert t.main(["-w", wd, "--start", "beta", "--finish", "beta"]) == 0
    assert t.trace == ["beta"]
    # bounded run is not a finished run
    assert not os.path.exists(os.path.join(wd, "SUCCESS"))
    assert os.path.exists(os.path.join(wd, "SUCCESS.beta"))

    # finish the rest; already-done beta is skipped under --continue
    t2 = StepTool()
    assert t2.main(["-w", wd, "--continue"]) == 0
    assert t2.trace == ["alpha", "gamma"]
    assert os.path.exists(os.path.join(wd, "SUCCESS"))


def test_unknown_stage_is_an_error(tmp_path):
    wd = str(tmp_path / "wd")
    t = StepTool()
    assert t.main(["-w", wd, "--start", "nope"]) == 1
    assert t.trace == []
    t2 = StepTool()
    assert t2.main(["-w", wd, "--start", "gamma", "--finish", "alpha"]) == 1
    assert t2.trace == []


def test_single_stage_start_finish_validation(tmp_path):
    wd = str(tmp_path / "wd")
    t = OutTool()
    assert t.main(["-w", wd, "--start", "bogus"]) == 1
    t2 = OutTool()
    assert t2.main(["-w", wd, "--start", "out-tool", "--finish", "out-tool"]) == 0
    assert t2.ran == 1


def test_mid_pipeline_resume(tmp_path):
    """A step pipeline interrupted after step 1 resumes at step 2."""
    wd = str(tmp_path / "wd")

    class Flaky(StepTool):
        def __init__(self, explode: bool):
            super().__init__()
            self.explode = explode
            if explode:
                # make beta raise after alpha has checkpointed
                self._steps[1] = (
                    "beta",
                    lambda: (_ for _ in ()).throw(
                        ExecutionFailedException("boom")))

    t = Flaky(True)
    assert t.main(["-w", wd]) == 1
    assert t.trace == ["alpha"]
    assert os.path.exists(os.path.join(wd, "SUCCESS.alpha"))
    assert not os.path.exists(os.path.join(wd, "SUCCESS"))

    t2 = Flaky(False)
    assert t2.main(["-w", wd, "--continue"]) == 0
    assert t2.trace == ["beta", "gamma"]
    assert os.path.exists(os.path.join(wd, "SUCCESS"))
