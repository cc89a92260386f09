"""Shim: fixture builders moved into the package so the registered
end-to-end ETL query can use them too."""

from ffiec_pq_spark.testing.fixtures import *  # noqa: F401,F403
from ffiec_pq_spark.testing.fixtures import (  # noqa: F401
    N_BANKS,
    PURE_COLS,
    TYPE_DICT,
    make_broken_zip,
    make_call_zip,
    make_call_zip_q2,
    make_mdrm_zip,
    make_taxonomy_zip,
    make_xbrl_zip,
)
