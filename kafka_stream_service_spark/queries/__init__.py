"""Declared query/operator catalog (SURVEY.md §2.2).

Every module in this package registers queries via ``registry.query``.
Importing the package imports all modules, populating the registry that
``__spark_entry__.py`` exposes to the driver.
"""

from __future__ import annotations

from .registry import QUERIES, oracle_sql_dict, queries_dict, query  # noqa: F401

# Import for registration side effects — order defines catalog order.
from . import relational  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import setops  # noqa: E402,F401
from . import events_q  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import extras  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import tpch_extra2  # noqa: E402,F401
from . import llm_extra  # noqa: E402,F401
from . import scalar2  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import codec_q  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import multimodal2  # noqa: E402,F401
from . import audio  # noqa: E402,F401
from . import streaming_replay  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import corpus_ops  # noqa: E402,F401
from . import chunking  # noqa: E402,F401
from . import graph_q  # noqa: E402,F401
from . import lakehouse  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import storage_q  # noqa: E402,F401
from . import dedup2  # noqa: E402,F401
from . import quality_ops  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import mlops  # noqa: E402,F401
from . import sqlfeatures  # noqa: E402,F401
from . import stataudit  # noqa: E402,F401
from . import arrowops  # noqa: E402,F401
from . import round7  # noqa: E402,F401
from . import round7b  # noqa: E402,F401
from . import round7c  # noqa: E402,F401
from . import round7d  # noqa: E402,F401
from . import round7e  # noqa: E402,F401
from . import round7f  # noqa: E402,F401
from . import round7g  # noqa: E402,F401
from . import round7h  # noqa: E402,F401
from . import round7i  # noqa: E402,F401
from . import round7j  # noqa: E402,F401
from . import round7k  # noqa: E402,F401
from . import round7l  # noqa: E402,F401
from . import round7m  # noqa: E402,F401
from . import round7n  # noqa: E402,F401
from . import round8  # noqa: E402,F401
from . import round8b  # noqa: E402,F401
from . import round8c  # noqa: E402,F401
from . import round8d  # noqa: E402,F401
from . import round8e  # noqa: E402,F401
from . import round8f  # noqa: E402,F401
from . import round8g  # noqa: E402,F401
from . import round8h  # noqa: E402,F401
from . import round9  # noqa: E402,F401
from . import round9b  # noqa: E402,F401
from . import round9c  # noqa: E402,F401
from . import round9d  # noqa: E402,F401
from . import round9e  # noqa: E402,F401
from . import round9f  # noqa: E402,F401
from . import round9g  # noqa: E402,F401
from . import round9h  # noqa: E402,F401
from . import round10  # noqa: E402,F401
from . import round10b  # noqa: E402,F401
from . import round10c  # noqa: E402,F401
from . import round10d  # noqa: E402,F401
from . import round11  # noqa: E402,F401
from . import round11b  # noqa: E402,F401
from . import round11c  # noqa: E402,F401
from . import round11d  # noqa: E402,F401
from . import round11e  # noqa: E402,F401
from . import round11f  # noqa: E402,F401
from . import round11g  # noqa: E402,F401
from . import round11h  # noqa: E402,F401
from . import round11i  # noqa: E402,F401
from . import round11j  # noqa: E402,F401
from . import round11k  # noqa: E402,F401
from . import round11l  # noqa: E402,F401
from . import round11m  # noqa: E402,F401
from . import round11n  # noqa: E402,F401
from . import round11o  # noqa: E402,F401
from . import round11p  # noqa: E402,F401
from . import round11q  # noqa: E402,F401
from . import round11r  # noqa: E402,F401
from . import round11s  # noqa: E402,F401
from . import round11t  # noqa: E402,F401
from . import round11u  # noqa: E402,F401
from . import round11v  # noqa: E402,F401
from . import round12  # noqa: E402,F401
