"""Explicit StructType schemas for every dataset the engine touches.

The reference has no schema system — every RDD's shape lives in the
lambdas that index into its tuples (SURVEY.md §1, e.g. parse sites
``engine.py:96``, ``spark_music.py:12``). Here every schema is an explicit
``StructType``: inference is banned on production paths (inference = an
extra full scan at 100 TB, plus silent type drift between files).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- reference-domain tables (FIXTURES.md §1-6) -------------------------

#: ratings (user_id, song_id, rating) — reference parse engine.py:96.
RATINGS = StructType(
    [
        StructField("user_id", IntegerType(), False),
        StructField("song_id", IntegerType(), False),
        StructField("rating", DoubleType(), False),
    ]
)

#: song catalog — songs_metadata_file_new.csv header (6 cols).
SONGS = StructType(
    [
        StructField("new_song_ID", IntegerType(), False),
        StructField("title", StringType(), True),
        StructField("release", StringType(), True),
        StructField("artist_name", StringType(), True),
        StructField("year", IntegerType(), True),  # 0 = missing sentinel
        StructField("song_id", StringType(), True),
    ]
)

#: streaming rating event, shape A — spark_streaming_kafka.py:18-20.
RATING_EVENT_A = StructType(
    [
        StructField("userid", IntegerType(), True),
        StructField("songid", IntegerType(), True),
        StructField("rating", DoubleType(), True),
    ]
)

#: streaming rating event, shape B — spark_kafka.py:76-80 (slot cycles
#: m1/m2/m3; 'm3' is the session-flush sentinel).
RATING_EVENT_B = StructType(
    [
        StructField("userid", IntegerType(), True),
        StructField(
            "music",
            StructType(
                [
                    StructField("slot", StringType(), True),
                    StructField("song_id", IntegerType(), True),
                ]
            ),
            True,
        ),
        StructField("rating", IntegerType(), True),
    ]
)

#: MSD listen triplets (ETL input) — music_ETL.ipynb#cell2.
LISTEN_TRIPLETS = StructType(
    [
        StructField("user_id", StringType(), False),
        StructField("song_id", StringType(), False),
        StructField("listen_count", IntegerType(), False),
    ]
)

#: lyrics — lyric.ipynb#cell2.
LYRICS = StructType(
    [
        StructField("album", StringType(), True),
        StructField("artist", StringType(), True),
        StructField("song", StringType(), True),
        StructField("witter", StringType(), True),
        StructField("general", StringType(), True),
        StructField("style", StringType(), True),
        StructField("lyric", StringType(), True),
    ]
)

#: recommendation output — engine.py:46 tuple shape, as columns.
RECOMMENDATIONS = StructType(
    [
        StructField("title", StringType(), True),
        StructField("predicted_rating", DoubleType(), True),
        StructField("num_ratings", LongType(), True),
    ]
)

# --- driver testdata tables (/root/testdata, TESTDATA.md) ---------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("props", StringType(), True),  # JSON string
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), True),
    ]
)

#: props payload inside events.props — '{"k": <int>}'.
EVENT_PROPS = StructType([StructField("k", LongType(), True)])

# --- multimodal (operators/multimodal.py) -------------------------------

#: An opaque media blob + typed metadata. The binary payload is never
#: interpreted by Spark itself; decode/feature-extract run as Arrow-batched
#: pandas UDFs (stubbed in this container — see operators/multimodal.py).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

#: Extracted media features (decode output contract).
MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)
