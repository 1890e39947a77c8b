"""Query registry feeding ``__spark_entry__.py``.

Importing this package registers every query module's entries.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401

from . import queries_core  # noqa: E402,F401
from . import queries_windows  # noqa: E402,F401
from . import queries_joins  # noqa: E402,F401
from . import queries_stateful  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_ext  # noqa: E402,F401
from . import queries_corpus  # noqa: E402,F401
from . import queries_sql  # noqa: E402,F401
from . import queries_mlprep  # noqa: E402,F401
from . import queries_scale  # noqa: E402,F401
from . import queries_cep  # noqa: E402,F401
from . import queries_trainprep  # noqa: E402,F401
from . import queries_quality  # noqa: E402,F401
from . import queries_mlops  # noqa: E402,F401
from . import queries_graph  # noqa: E402,F401
from . import queries_tsfeat  # noqa: E402,F401
from . import queries_mining  # noqa: E402,F401
from . import queries_eval  # noqa: E402,F401
from . import queries_recsys  # noqa: E402,F401
from . import queries_robust  # noqa: E402,F401
from . import queries_ledger  # noqa: E402,F401
from . import queries_diag  # noqa: E402,F401
from . import queries_lm  # noqa: E402,F401
from . import queries_cdc  # noqa: E402,F401
from . import queries_queueing  # noqa: E402,F401
from . import queries_textmining  # noqa: E402,F401
from . import queries_audit  # noqa: E402,F401
from . import queries_er  # noqa: E402,F401
from . import queries_stattests  # noqa: E402,F401
from . import queries_econo  # noqa: E402,F401
from . import queries_graphdist  # noqa: E402,F401
from . import queries_layout  # noqa: E402,F401
from . import queries_datasel  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
