from mimic_spark.sources.changelog import (  # noqa: F401
    ChangelogSpec,
    gen_changelog_df,
    gen_events_py,
    replay_oracle_py,
    write_changelog_chunks,
)
from mimic_spark.sources.wal_json import (  # noqa: F401
    encode_wal_envelope,
    parse_wal_envelope,
    read_wal_json,
    stream_wal_json,
    write_wal_json_chunks,
)
