"""``python -m newspapers_etl_spark`` → the batch CLI (cli.py)."""

from newspapers_etl_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
