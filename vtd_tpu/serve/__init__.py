"""Serving layer: REST API, job queue, storage, DB — API-surface parity
with the reference's FastAPI/Celery/SQLAlchemy stack, built on the
Python stdlib (http.server, sqlite3, hmac/hashlib JWT, threads)."""

from .app import create_app

__all__ = ["create_app"]
