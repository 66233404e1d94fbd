"""Explicit schemas — schema-on-write everywhere, zero inference.

Mirrors the reference's declared schemas (reference:
services/streaming-service/schema.py:6-97) and the driver's synthetic tables
(FIXTURES.md §B). The GitHub payload stays an *unparsed JSON string* column:
the reference deliberately re-extracts payload fields from the raw Kafka
string with JSONPath because ``map<string,string>`` parsing would mangle
nested objects (reference: services/streaming-service/event_processor.py:73-81).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# GitHub event (nested) — parse target for from_json
# (reference: services/streaming-service/schema.py:6-50)
# ---------------------------------------------------------------------------

ACTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("login", T.StringType(), True),
        T.StructField("display_login", T.StringType(), True),
        T.StructField("gravatar_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("avatar_url", T.StringType(), True),
    ]
)

REPO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)

ORG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("login", T.StringType(), True),
        T.StructField("gravatar_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("avatar_url", T.StringType(), True),
    ]
)

GITHUB_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("actor", ACTOR_SCHEMA, True),
        T.StructField("repo", REPO_SCHEMA, True),
        T.StructField("org", ORG_SCHEMA, True),
        # payload intentionally NOT declared here; extracted from the raw
        # JSON string (see module docstring).
        T.StructField("public", T.BooleanType(), True),
        T.StructField("created_at", T.StringType(), True),
        T.StructField("processed_at", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Flattened fact table — 26 columns
# (reference DDL: services/streaming-service/api.py:206-233)
# ---------------------------------------------------------------------------

FLATTENED_EVENT_COLUMNS: list[str] = [
    "event_id",
    "event_type",
    "event_category",
    "created_at",
    "processed_at",
    "actor_id",
    "actor_login",
    "actor_avatar_url",
    "repo_id",
    "repo_name",
    "repo_url",
    "org_id",
    "org_login",
    "is_public",
    "action",
    "ref",
    "ref_type",
    "master_branch",
    "description",
    "pusher_type",
    "payload_json",
    "processing_date",
    "processing_hour",
    "has_actor",
    "has_repo",
    "has_org",
]

# Event-type -> category mapping (reference:
# services/streaming-service/schema.py:100-116; default branch 'other' at
# event_processor.py:105). This is the GitHub-domain categorizer; the driver's
# synthetic `events` table has its own domain, mapped in functions/scalar.py.
EVENT_TYPE_CATEGORIES: dict[str, str] = {
    "PushEvent": "code",
    "PullRequestEvent": "code",
    "CommitCommentEvent": "code",
    "PullRequestReviewEvent": "code",
    "PullRequestReviewCommentEvent": "code",
    "IssuesEvent": "issues",
    "IssueCommentEvent": "issues",
    "WatchEvent": "social",
    "ForkEvent": "social",
    "CreateEvent": "repository",
    "DeleteEvent": "repository",
    "PublicEvent": "repository",
    "ReleaseEvent": "releases",
    "MemberEvent": "collaboration",
    "TeamEvent": "collaboration",
}
DEFAULT_EVENT_CATEGORY = "other"

# ---------------------------------------------------------------------------
# Driver synthetic tables (FIXTURES.md §B; /root/testdata/sf*/)
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

STAR_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES: tuple[str, ...] = STAR_TABLES + ("events", "documents", "embeddings")
