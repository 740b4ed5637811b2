"""DSN-dispatched database backends (sqlite default, Postgres option).

The reference runs Postgres in prod and sqlite in tests
(app/database/database.py:10-17); make_database mirrors that split.
psycopg2 is absent from this image, so the Postgres path is exercised
up to its import gate plus the pure dialect-translation helpers.
"""
import pytest

from vtd_tpu.serve.db.database import (
    Database,
    make_database,
    pg_schema,
    pg_sql,
)


def test_make_database_sqlite_default(tmp_path):
    db = make_database(f"sqlite:///{tmp_path}/t.db")
    assert isinstance(db, Database)
    db.init_db()
    assert db.health_check()["status"] == "healthy"
    db.close()


def test_make_database_postgres_requires_driver():
    try:
        import psycopg2  # noqa: F401

        pytest.skip("psycopg2 present; gate untestable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="psycopg2"):
        make_database("postgresql://u:p@localhost/vtd")


def test_pg_schema_dialect():
    s = pg_schema()
    assert "AUTOINCREMENT" not in s
    assert "strftime" not in s
    assert "BIGSERIAL PRIMARY KEY" in s
    assert "to_char(now()" in s
    # every table/index survives the translation
    for name in (
        "users", "videos", "frames", "text_detections",
        "processing_jobs", "model_versions", "idx_jobs_task",
    ):
        assert name in s


def test_pg_sql_placeholders():
    assert (
        pg_sql("SELECT * FROM videos WHERE id = ? AND owner_id = ?")
        == "SELECT * FROM videos WHERE id = %s AND owner_id = %s"
    )


def test_sqlite_schema_version_roundtrip(tmp_path):
    db = Database(f"sqlite:///{tmp_path}/v.db")
    db.init_db()
    # migrations ran: version is the latest step
    from vtd_tpu.serve.db.migrations import MIGRATIONS

    assert db.get_schema_version() == MIGRATIONS[-1][0]
    db.set_schema_version(99)
    assert db.get_schema_version() == 99
    db.close()
