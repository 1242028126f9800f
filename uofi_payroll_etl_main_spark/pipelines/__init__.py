"""End-to-end dataflows (SURVEY.md section 3): PUA and CPA.

Each pipeline is ONE lazy DataFrame plan from sources to the output
contract -- Catalyst sees the whole chain, so filters/projections push
into the scans and each broadcast dim ships once.  The reference
executes the same chain eagerly statement-by-statement with a full
materialization per step (etl_payroll_pipeline.py:235-380, :433-591).
"""

from .pua import run_pua
from .cpa import run_cpa

__all__ = ["run_pua", "run_cpa"]
