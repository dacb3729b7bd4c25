from troute_tpu.diffusive.xsection import build_xsec_tables
from troute_tpu.diffusive.solver import DiffusiveDomain, DiffusiveState, run_diffusive
