"""Native hyper-parameter search (Optuna-equivalent for this framework).

The reference drives training through an Optuna study
(``train.py:82-103``) whose search space is a tiny categorical grid —
``d_model in {32,16} x stack_size in {1,3} x w_steps in {4000}``
(``train.py:117-119``) with duplicate-config pruning
(``train.py:121-123``), i.e. effectively an exhaustive grid of 4 points.
This module provides a dependency-free study object with the same call
surface (``suggest_categorical`` / ``optimize`` / ``best_trial`` /
``get_trials``): the space is recorded from the first trial's suggestions,
subsequent trials enumerate unseen grid points (sampler='grid') or draw
randomly (sampler='random'), and duplicate configs are pruned.
"""

from __future__ import annotations

import dataclasses
import itertools
import random
from typing import Any, Callable, Dict, List, Optional, Sequence


class TrialPruned(Exception):
    """Raised to abandon a trial (Optuna-compatible)."""


@dataclasses.dataclass
class Trial:
    number: int
    study: "Study"
    params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    value: Optional[float] = None
    state: str = "RUNNING"  # RUNNING | COMPLETE | PRUNED
    assigned: Optional[Dict[str, Any]] = None
    intermediate: Dict[int, float] = dataclasses.field(default_factory=dict)

    def suggest_categorical(self, name: str, choices: Sequence[Any]) -> Any:
        choices = list(choices)
        self.study._space.setdefault(name, choices)
        if self.assigned is not None and name in self.assigned:
            value = self.assigned[name]
        else:
            value = self.study._rng.choice(choices)
        self.params[name] = value
        return value

    # -- pruning API (Optuna-compatible; the reference's baselines study
    # attaches a HyperbandPruner, ``baselines.py:109``) ------------------ #

    def report(self, value: float, step: int) -> None:
        self.intermediate[int(step)] = float(value)

    def should_prune(self) -> bool:
        """Median rule: prune when the latest reported value is worse than
        the median of other trials' values at the same step (after a
        warmup of 5 steps)."""
        if not self.intermediate:
            return False
        step = max(self.intermediate)
        if step < 5:
            return False
        others = [
            t.intermediate[step]
            for t in self.study.trials
            if t is not self and step in t.intermediate
        ]
        if not others:
            return False
        median = sorted(others)[len(others) // 2]
        return self.intermediate[step] > median


class Study:
    """Minimizing study over an ``objective(trial) -> float`` callable."""

    def __init__(self, study_name: str = "study", direction: str = "minimize",
                 sampler: str = "grid", seed: Optional[int] = None):
        if direction != "minimize":
            raise ValueError("only 'minimize' studies are supported")
        self.study_name = study_name
        self.sampler = sampler
        self.trials: List[Trial] = []
        self._space: Dict[str, List[Any]] = {}
        self._seen_params: List[Dict[str, Any]] = []
        self._rng = random.Random(seed)

    def _next_grid_point(self) -> Optional[Dict[str, Any]]:
        if not self._space:
            return None  # space unknown until one trial has run
        keys = list(self._space)
        for combo in itertools.product(*(self._space[k] for k in keys)):
            point = dict(zip(keys, combo))
            if point not in self._seen_params:
                return point
        return {}  # grid exhausted

    def optimize(self, objective: Callable[[Trial], float], n_trials: int = 5,
                 n_jobs: int = 1) -> None:
        """Run up to n_trials.  n_jobs accepted for API parity; trials run
        sequentially (a single jitted trainer saturates the chip — thread
        parallelism, the reference's ``n_jobs=4``, would only contend)."""
        for _ in range(n_trials):
            assigned = None
            if self.sampler == "grid":
                assigned = self._next_grid_point()
                if assigned == {}:  # exhausted
                    break
            trial = Trial(number=len(self.trials), study=self, assigned=assigned)
            self.trials.append(trial)
            try:
                value = objective(trial)
            except TrialPruned:
                trial.state = "PRUNED"
                continue
            if trial.params in self._seen_params:
                trial.state = "PRUNED"
                continue
            self._seen_params.append(dict(trial.params))
            trial.value = float(value)
            trial.state = "COMPLETE"

    def get_trials(self, deepcopy: bool = False, states=None) -> List[Trial]:
        if states is None:
            return list(self.trials)
        wanted = {s if isinstance(s, str) else str(s) for s in states}
        return [t for t in self.trials if t.state in wanted]

    @property
    def best_trial(self) -> Trial:
        complete = [t for t in self.trials if t.state == "COMPLETE"]
        if not complete:
            raise ValueError("no completed trials")
        return min(complete, key=lambda t: t.value)


def create_study(study_name: str = "study", direction: str = "minimize",
                 sampler: str = "grid", seed: Optional[int] = None) -> Study:
    return Study(study_name, direction, sampler, seed)
