"""Empty-lake contract: every registry key must handle zero-row input
tables (real schemas, no rows) by returning an empty/degenerate result
— never by leaking an engine internal (schema-inference
AnalysisException, raw numpy AxisError, ...).

At 100 TB this is not an edge case: incremental runs hit empty
partitions, empty dates, and empty tenants constantly, and a pipeline
that crashes on them cannot be scheduled unconditionally. The five
model-fitting keys that genuinely cannot produce output from an empty
corpus (quantizer/PCA/k-means fits) raise a NAMED ValueError instead —
that contract is pinned here too, so a refactor can't silently swap it
for an AxisError (the defect this sweep originally caught, alongside
write_parquet_roundtrip's UNABLE_TO_INFER_SCHEMA on zero-row
partitioned writes).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from data_pipeline2_spark import registry

from .conftest import SF_SMOKE

# keys whose empty-corpus semantics are a NAMED refusal, not an empty
# result: fitting a codebook/projection/centroid set on nothing is
# undefined, and silently emitting garbage would be worse than raising
EXPECTED_RAISE = {
    "knn_batch_pq": "pq_fit",
    "pq_quantize": "pq_fit",
    "knn_batch_ivfpq": "kmeans_fit",
    "knn_batch_sq8": "knn_batch_sq8",
    "pca_project": "pca_fit",
    # fitting a quality scorer on nothing is undefined, same contract
    "quality_classifier_fit": "empty corpus",
    "quality_classifier_score": "empty corpus",
}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_lake(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_lake"))
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SF_SMOKE, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(out, f"{t}.parquet"))
    return out


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_key_survives_empty_lake(name, spark, empty_lake):
    fn = registry.queries()[name]
    if name in EXPECTED_RAISE:
        with pytest.raises(ValueError, match=EXPECTED_RAISE[name]):
            fn(spark, empty_lake).count()
    else:
        assert fn(spark, empty_lake).count() >= 0
