from opentelemetry_collector_spark.sources.transcripts import (  # noqa: F401
    derive_transcripts,
    load_table,
    synth_transcripts,
)
from opentelemetry_collector_spark.sources.lookups import (  # noqa: F401
    role_lookup_df,
    tool_lookup_df,
)
