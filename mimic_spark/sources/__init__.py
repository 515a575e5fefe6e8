from mimic_spark.sources.changelog import (  # noqa: F401
    ChangelogSpec,
    gen_changelog_df,
    gen_events_py,
    replay_oracle_py,
    write_changelog_chunks,
)
