"""LLM-data-pipeline operators (SURVEY.md §2.K) — compatibility facade.

Round 5 split the 2,400-line module into three focused ones with keys
and behavior unchanged (VERDICT r4 task 9):

- :mod:`.llm_dedup`   — the dedup ladder (K1/K2)
- :mod:`.llm_knn`     — embedding similarity search (K3)
- :mod:`.llm_scoring` — text analysis & corpus scoring (K4)

Importing this module still registers every query (the submodule
imports below run their ``@query`` decorators), and the names external
code historically imported from here are re-exported unchanged.
"""

from __future__ import annotations

from flink_tutorial_broadcast_spark.operators.llm_dedup import (  # noqa: F401
    _EMBED_DUP_LIMIT,
    _EMBED_DUP_THRESHOLD,
    _HAMMING_MAX,
    _INCR_BATCH_LIMIT,
    _INCR_CORPUS_LIMIT,
    _NEAR_DUP_LIMIT,
    _PSH_BITS,
    _bigrams,
    q_dedup_incremental,
    q_dedup_near,
    q_dedup_simhash_portable,
)
from flink_tutorial_broadcast_spark.operators.llm_knn import (  # noqa: F401
    _N_PROBES,
    _TOP_K,
    _cosine,
    _dot,
)
from flink_tutorial_broadcast_spark.operators.llm_scoring import (  # noqa: F401,E501
    q_winnow_crossdoc,
)
