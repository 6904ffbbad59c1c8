"""light-curve-python-spark: a PySpark-native point-in-time
feature-engineering engine with the capabilities of
light-curve/light-curve-python, re-expressed Spark-first.

Deliberately import-light: executors import submodules directly
(``operators.extract``, ``functions.kernels``, ...), and a heavy package
root would tax every Python worker start.  The reference-shaped
single-curve API lives in ``light_curve_python_spark.compat``.
"""

__version__ = "0.5.0"  # round-numbered: bumped per driver round
