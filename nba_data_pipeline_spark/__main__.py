"""``python -m nba_data_pipeline_spark`` — see cli.py for the commands."""

from nba_data_pipeline_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
