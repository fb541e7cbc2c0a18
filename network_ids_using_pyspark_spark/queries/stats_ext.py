"""Statistical-inference extensions — compatibility facade.

The 58-query family formerly in this file is split by family (VERDICT
r5 ask #5) into :mod:`stats_hypothesis`, :mod:`stats_regression`,
:mod:`stats_causal`, and :mod:`stats_calibration`; importing this
module imports all four in the original registration order, so the
registry is unchanged.  Every public and private symbol is re-exported
here so existing imports (`queries.streaming`, `queries.causal_ext`,
`queries.rangescale`, tests) keep working.
"""

from __future__ import annotations

# imported in the original in-file order so registration order (and
# therefore the driver's window composition) is byte-identical
from . import stats_hypothesis  # isort: skip
from . import stats_regression  # isort: skip
from . import stats_causal  # isort: skip
from . import stats_calibration  # isort: skip

for _m in (stats_hypothesis, stats_regression, stats_causal, stats_calibration):
    globals().update(
        {_k: _v for _k, _v in vars(_m).items() if not _k.startswith("__")}
    )
del _m
