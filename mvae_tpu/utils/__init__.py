"""Utilities: special functions (log I_nu, erfcx), profiling/NaN guards."""
from . import profiling, special

__all__ = ["special", "profiling"]
