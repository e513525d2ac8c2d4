"""Config-driven DAG orchestration over DataFrames (SURVEY.md §2.8 M4-M6).

Reference: OrchestratorConfiguration{steps:[{stepNumber, functionToRun,
customErrorFunction?, fanOutAfter, fanInBefore, fanInFailIfAnyFail}],
globalErrorFunction} executed by a recursive durable-function engine
(spikes/nonhl7-orchestration/.../FnOrchestrator.kt:32-194; DTOs
OrchestratorDtos.kt:8-25). Its tests assert the exact ordered sequence of
executed (stepNumber:functionName) pairs including branch ids like "2_0"
(Unit_FnOrchestrator.kt:34-334) — ours do the same.

Spark restatement: a *step function* is a named DataFrame -> DataFrame
transformation resolved from a registry (the reference's
`callActivity(functionName, ...)`, FnOrchestrator.kt:196-206). Fan-out maps a
branching function over N branch DataFrames (Spark's DAG scheduler runs the
branches as independent plan subtrees); fan-in is a union barrier with the
reference's two failure policies (any-fail vs all-fail). Because plans are
lazy, "executing" a step composes the plan; errors surface per-row in an
`_error` column (M5: the reference's pipe short-circuits per message,
Util.kt:19-21 — rows, not jobs, carry failure)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

StepFn = Callable[[DataFrame], DataFrame]
BranchFn = Callable[[DataFrame], list[DataFrame]]

# registry of named transformations (FunctionDefinition analog,
# OrchestratorDtos.kt:22-25)
_REGISTRY: dict[str, StepFn | BranchFn] = {}


def register(name: str):
    def wrap(fn):
        _REGISTRY[name] = fn
        return fn

    return wrap


def resolve(name: str) -> StepFn | BranchFn:
    if name not in _REGISTRY:
        raise KeyError(f"no registered function: {name}")
    return _REGISTRY[name]


@dataclass
class Step:
    step_number: int
    function_to_run: str
    custom_error_function: str | None = None
    fan_out_after: bool = False
    fan_in_before: bool = False
    fan_in_fail_if_any_fail: bool = True


@dataclass
class OrchestratorConfig:
    steps: list[Step]
    global_error_function: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "OrchestratorConfig":
        return cls(
            steps=[
                Step(
                    step_number=s["stepNumber"],
                    function_to_run=s["functionToRun"],
                    custom_error_function=s.get("customErrorFunction"),
                    fan_out_after=s.get("fanOutAfter", False),
                    fan_in_before=s.get("fanInBefore", False),
                    fan_in_fail_if_any_fail=s.get("fanInFailIfAnyFail", True),
                )
                for s in d["steps"]
            ],
            global_error_function=d.get("globalErrorFunction"),
        )


@dataclass
class Trace:
    """Executed (step, function, branch) sequence — the assertable artifact
    the reference's tests check (Unit_FnOrchestrator.kt:108-138)."""

    executed: list[str] = field(default_factory=list)

    def mark(self, step: int, fn: str, branch: str) -> None:
        self.executed.append(f"{step}:{fn}" + (f"@{branch}" if branch else ""))


class OrchestrationError(RuntimeError):
    pass


def run_orchestration(
    config: OrchestratorConfig,
    df: DataFrame,
    trace: Trace | None = None,
    _branch: str = "",
) -> DataFrame:
    """Execute the configured step list over a DataFrame.

    fan_out_after=True: the step's function must return a LIST of branch
    DataFrames; subsequent steps run per branch (branch ids "0","1",... or
    nested "2_0" — FnOrchestrator.kt:131-144) until a fan_in_before step
    unions them (allOf barrier, :144-189). Mis-specified fans raise, like the
    reference's step-count verification (:32-69).
    """
    trace = trace if trace is not None else Trace()
    try:
        return _run(config, config.steps, df, trace, _branch)
    except OrchestrationError:
        if config.global_error_function:
            handler = resolve(config.global_error_function)
            trace.mark(-1, config.global_error_function, _branch)
            return handler(df)
        raise


def _run(config, steps: list[Step], df: DataFrame, trace: Trace, branch: str) -> DataFrame:
    i = 0
    current: DataFrame = df
    while i < len(steps):
        step = steps[i]
        if step.fan_in_before:
            raise OrchestrationError(
                f"fan-in at step {step.step_number} without matching fan-out"
            )
        fn = resolve(step.function_to_run)
        try:
            result = fn(current)
            trace.mark(step.step_number, step.function_to_run, branch)
        except Exception as e:
            if step.custom_error_function:
                trace.mark(step.step_number, step.custom_error_function, branch)
                current = resolve(step.custom_error_function)(current)
                i += 1
                continue
            raise OrchestrationError(f"step {step.step_number} failed: {e}") from e

        if step.fan_out_after:
            if not isinstance(result, list):
                raise OrchestrationError(
                    f"step {step.step_number} declared fanOutAfter but returned one DataFrame"
                )
            # find the matching fan-in
            j = i + 1
            depth = 1
            while j < len(steps):
                if steps[j].fan_out_after:
                    depth += 1
                if steps[j].fan_in_before:
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= len(steps):
                raise OrchestrationError(
                    f"fan-out at step {step.step_number} never fans in"
                )
            branch_steps = steps[i + 1 : j]
            fan_in_step = steps[j]
            outs: list[DataFrame] = []
            failures: list[str] = []
            for b, bdf in enumerate(result):
                bid = f"{branch}_{b}" if branch else str(b)
                try:
                    outs.append(_run(config, branch_steps, bdf, trace, bid))
                except OrchestrationError as e:
                    failures.append(f"branch {bid}: {e}")
            if failures and (fan_in_step.fan_in_fail_if_any_fail or not outs):
                raise OrchestrationError(
                    f"fan-in at step {fan_in_step.step_number}: {'; '.join(failures)}"
                )
            merged = outs[0]
            for o in outs[1:]:
                merged = merged.unionByName(o, allowMissingColumns=True)
            fin = resolve(fan_in_step.function_to_run)
            current = fin(merged)
            trace.mark(fan_in_step.step_number, fan_in_step.function_to_run, branch)
            i = j + 1
        else:
            if isinstance(result, list):
                raise OrchestrationError(
                    f"step {step.step_number} returned branches without fanOutAfter"
                )
            current = result
            i += 1
    return current
