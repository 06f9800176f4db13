"""Path-parity alias: the reference exposes the wrapper class as
``artm.master_component`` (python/artm/master_component.py), so ported
scripts write ``import bigartm_spark.master_component as mc`` and get
the same module shape. Implementation lives in model/master_component.py.
"""

from bigartm_spark.model.master_component import MasterComponent

__all__ = ["MasterComponent"]
