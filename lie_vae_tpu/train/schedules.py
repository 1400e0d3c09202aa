"""Host-side scalar schedules and the named beta-schedule presets.

Reference: ConstantSchedule/LinearSchedule (lie_vae/experiments/utils.py:54-72)
and get_beta_schedule's 25 named presets ('a'..'z', no 't') (lie_vae/experiments/beta_schedule.py).
Schedules run on host; the resulting scalar is fed into the jitted step as an
argument, so schedule changes never trigger recompilation.
"""
import numpy as np


class ConstantSchedule:
    def __init__(self, value):
        self.value = value

    def __call__(self, x):
        return float(self.value)


class LinearSchedule:
    """Clamped linear ramp from (start_x, start_y) to (end_x, end_y).

    Reference: experiments/utils.py:62-72 (same clamping semantics,
    including descending ramps).
    """

    def __init__(self, start_y, end_y, start_x, end_x):
        self.min_y = min(start_y, end_y)
        self.max_y = max(start_y, end_y)
        self.start_x = start_x
        self.start_y = start_y
        self.coef = (end_y - start_y) / (end_x - start_x)

    def __call__(self, x):
        return float(np.clip((x - self.start_x) * self.coef + self.start_y,
                             self.min_y, self.max_y))


# Named presets: (start_y, end_y, start_x, end_x) per schedule letter.
# Values from the reference's preset table (beta_schedule.py:4-59; there is
# deliberately no 't').
_PRESETS = {
    "a": (0.001, 1, 60000, 200000),
    "b": (0.001, 0.1, 60000, 200000),
    "c": (0.001, 0.01, 60000, 200000),
    "d": (0.001, 10, 60000, 200000),
    "e": (0.001, 0.1, 60000, 120000),
    "f": (0.001, 1, 60000, 120000),
    "g": (0.001, 0.3, 60000, 120000),
    "h": (0.001, 0.3, 30000, 60000),
    "i": (0.001, 1, 30000, 60000),
    "j": (0.001, 3, 30000, 60000),
    "k": (0.001, 10, 30000, 60000),
    "l": (0.001, 30, 30000, 60000),
    "m": (0.001, 3, 60000, 120000),
    "n": (0.001, 10, 60000, 120000),
    "o": (0.001, 30, 60000, 120000),
    "p": (0.001, 100, 60000, 120000),
    "q": (0.001, 10, 60000, 240000),
    "r": (0.001, 30, 60000, 600000),
    "s": (0.001, 3, 60000, 240000),
    "u": (3, 30, 60000, 120000),
    "v": (3, 30, 30000, 60000),
    "w": (1e-2, 1, 20000, 40000),
    "x": (7, 15, 250000, 750000),
    "y": (7, 20, 250000, 750000),
    "z": (7, 30, 250000, 750000),
}


def get_beta_schedule(schedule, beta):
    """Reference: get_beta_schedule, beta_schedule.py:4-59.

    Extension beyond the reference's preset table: ``warmupN`` (e.g.
    ``warmup2000``) is a linear ramp 0 -> beta over the first N steps —
    the production-recipe warm-up lever (BENCHMARKS escape-study block);
    identical to `scripts/run_converged_compare.py --beta_warmup N`.
    """
    if schedule is None and beta is not None:
        return ConstantSchedule(beta)
    if schedule in _PRESETS:
        return LinearSchedule(*_PRESETS[schedule])
    if schedule is not None and schedule.startswith("warmup"):
        try:
            steps = int(schedule[len("warmup"):])
        except ValueError:
            steps = 0
        if steps > 0:
            return LinearSchedule(0.0, beta if beta is not None else 1.0,
                                  0, steps)
    raise ValueError(
        f"Wrong beta schedule. Schedule={schedule}, beta={beta}")
