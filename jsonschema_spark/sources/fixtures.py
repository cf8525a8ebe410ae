"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2).

Generated entirely with Column expressions over ``spark.range`` — no
driver-side loops, no Python RNG — so the same generator scales from
10^3 unit-test rows to 10^8 bench rows and is reproducible by
construction: every "random" draw is ``xxhash64(id, seed)`` arithmetic.

Shape (BASELINE.json input_hint):
  conv_id:string, turn_idx:int, role:string, text:string,
  tool:string, ts:timestamp
with planted violations at deterministic rates:
  - Zipf-ish skewed conversation lengths (hot conv_ids -> salting tests)
  - ~0.5% duplicate (conv_id, turn_idx) pairs (uniqueness violations)
  - ~0.3% negative turn_idx (minimum violations)
  - ~1% out-of-vocab role + occasional null role (enum/required/RI)
  - text length tails at 0 and >4000 (min/maxLength violations)
  - ~1% unknown tool (RI violations); tool null on non-tool turns
  - a slice of out-of-range ts (maximum violations)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["system", "user", "assistant", "tool"]
EPOCH = "2025-01-01 00:00:00"

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega zero one two three four"
).split()


def _h(seed: int, *cols):
    """Deterministic uniform int64 from xxhash64 — the only randomness
    source, so output is a pure function of (n_convs, seed).  Plain
    strings are tag literals, never column names."""
    wrapped = [F.lit(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(F.lit(seed), *wrapped)


def _u(seed: int, *cols):
    """Uniform double in [0, 1)."""
    return (F.pmod(_h(seed, *cols), F.lit(1_000_000)) / 1_000_000.0)


def dim_roles(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(r,) for r in ROLES], "role string")


def dim_tools(spark: SparkSession) -> DataFrame:
    rows = [(f"tool_{i:02d}", f"team_{i % 8}") for i in range(32)]
    return spark.createDataFrame(rows, "tool string, owner string")


def transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    mean_turns: int = 12,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table with ~n_convs * mean_turns rows."""
    sc = spark.range(n_convs, numPartitions=partitions)
    # skewed lengths: most convs short, ~0.2% hot convs 40x the median
    base_len = (F.pmod(_h(seed, "len", F.col("id")), F.lit(2 * mean_turns - 2)) + 2)
    hot = _u(seed, F.lit("hot"), F.col("id")) < 0.002
    conv = sc.select(
        F.col("id").alias("cid"),
        F.format_string("c%08d", F.col("id")).alias("conv_id"),
        F.when(hot, base_len * 40).otherwise(base_len).cast("int").alias("n_turns"),
    )
    t = conv.select(
        "cid",
        "conv_id",
        "n_turns",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("raw_idx"),
    )
    rid = [F.col("cid"), F.col("raw_idx")]

    # turn_idx: ~0.3% negatives (minimum violations)
    turn_idx = F.when(
        _u(seed, F.lit("neg"), *rid) < 0.003, -(F.col("raw_idx") + 1)
    ).otherwise(F.col("raw_idx"))

    # role: cycle through dims; ~1% out-of-vocab; ~0.5% null
    role_pick = F.pmod(_h(seed, "role", *rid), F.lit(4))
    role_arr = F.array(*[F.lit(r) for r in ROLES])
    role = F.element_at(role_arr, (role_pick + 1).cast("int"))
    role = F.when(_u(seed, F.lit("oov"), *rid) < 0.01, F.lit("narrator")).otherwise(role)
    role = F.when(_u(seed, F.lit("nullrole"), *rid) < 0.005, F.lit(None)).otherwise(role)

    # text: deterministic token soup, word count 1..~60; planted tails
    words = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (F.pmod(_h(seed, "nw", *rid), F.lit(60)) + 1).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                words, (F.pmod(_h(seed, "w", F.col("cid"), F.col("raw_idx"), i), F.lit(len(_WORDS))) + 1).cast("int")
            ),
        ),
        " ",
    )
    u_text = _u(seed, F.lit("text"), *rid)
    text = (
        F.when(u_text < 0.004, F.lit(""))  # minLength violations
        .when(u_text < 0.008, F.repeat(F.lit("x"), 4321))  # maxLength violations
        .otherwise(body)
    )

    # tool: set on 'tool' role turns; ~1% unknown tool
    tool_pick = F.pmod(_h(seed, "tool", *rid), F.lit(32)).cast("int")
    tool = F.when(
        role == "tool",
        F.when(
            _u(seed, F.lit("oovtool"), *rid) < 0.01, F.lit("tool_zz")
        ).otherwise(F.format_string("tool_%02d", tool_pick)),
    ).otherwise(F.lit(None).cast("string"))

    # ts: monotone per conv; ~0.2% far-future outliers
    ts_base = F.to_timestamp(F.lit(EPOCH))
    ts = F.timestamp_seconds(
        F.unix_timestamp(ts_base)
        + F.col("cid") * 3600
        + F.col("raw_idx") * 17
        + F.when(_u(seed, F.lit("tsout"), *rid) < 0.002, F.lit(10 * 365 * 24 * 3600)).otherwise(F.lit(0))
    )

    df = t.select(
        F.col("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        F.col("cid"),
        F.col("raw_idx"),
    )

    # duplicates: re-emit ~0.5% of rows with identical (conv_id, turn_idx)
    dups = df.filter(_u(seed, F.lit("dup"), F.col("cid"), F.col("raw_idx")) < 0.005)
    return df.unionAll(dups).drop("cid", "raw_idx")


TRANSCRIPT_CORE_SCHEMA = {
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {
        "conv_id": {"type": "string", "pattern": "^c[0-9]{8}$"},
        "turn_idx": {"type": "integer", "minimum": 0},
        "role": {"type": "string", "enum": ["system", "user", "assistant", "tool"]},
        "text": {"type": "string", "minLength": 1, "maxLength": 4000},
    },
}


# richer flagship rule: every hot-path keyword class (type/pattern/
# length/bounds/enum + conditional required) — the scaling-benchmark
# workload (BASELINE.md)
TRANSCRIPT_FULL_SCHEMA = {
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {
        "conv_id": {"type": "string", "pattern": "^c[0-9]{8}$", "minLength": 9, "maxLength": 9},
        "turn_idx": {"type": "integer", "minimum": 0, "maximum": 100000},
        "role": {"type": "string", "enum": ["system", "user", "assistant", "tool"]},
        "text": {"type": "string", "minLength": 1, "maxLength": 4000,
                 "pattern": "^[\\x20-\\x7E\\s]*$"},
        "tool": {"pattern": "^tool_[0-9]{2}$"},
    },
    "if": {"keyMatch": {"role": "tool"}},
    "then": {"required": ["tool"]},
}


def gateway_requests(spark: SparkSession, n_rows: int = 1_000_000,
                     seed: int = 42, now: int = 1_700_000_000,
                     partitions: int | None = None) -> DataFrame:
    """Deterministic corpus for the reference's flagship gateway rule
    (exampleSchema shape, benchmark_test.go:12-47 exampleJSON): ~2%
    bad school, ~1% bad signature, ~1% stale timestamp, ~2% property
    violations; signatures computed with the same md5(concat) the rule
    checks."""
    df = spark.range(n_rows, numPartitions=partitions)
    rid = F.col("id")
    name = F.when(_u(seed, "gw_name", rid) < 0.02, F.format_string("x%04d", F.pmod(rid, 10000))) \
            .otherwise(F.format_string("bob%04d", F.pmod(rid, 10000)))
    age = F.when(_u(seed, "gw_age", rid) < 0.01, F.lit(130.0)) \
           .otherwise((F.pmod(_h(seed, "age", rid), F.lit(80)) + 18).cast("double"))
    school = F.when(_u(seed, "gw_sch", rid) < 0.02, F.lit("wh")).otherwise(F.lit("xx"))
    hobby_ok = F.array(F.lit("ball"), F.lit("game"))
    hobby = F.when(_u(seed, "gw_hob", rid) < 0.01, F.array(F.lit("knitting"))) \
             .otherwise(hobby_ok)
    ts = F.when(_u(seed, "gw_ts", rid) < 0.01, F.lit(now - 4000)) \
          .otherwise(F.lit(now) + F.pmod(_h(seed, "jit", rid), F.lit(200)) - 100)
    sig_true = F.md5(F.concat(name, ts.cast("string"), F.lit("secret1")).cast("binary"))
    sig = F.when(_u(seed, "gw_sig", rid) < 0.01, F.lit("bad")).otherwise(sig_true)
    return df.select(
        name.alias("name"), age.alias("age"), school.alias("school"),
        hobby.alias("hobby"), ts.cast("long").alias("timestamp"), sig.alias("sig"),
    )


GATEWAY_SCHEMA = {
    "set": {
        "userinfo": ["append()", "${name}", ":", "${age}"],
        "user_info": ["sprintf()", "name:%s  age:%s", "${name}", "${age}"],
    },
    "and": [
        {"if": {"neq": {"school": "wh"}},
         "then": {"set": {"skip_it": True}},
         "else": {"error": ["sprintf()", "invalid school '%v'", "${school}"]}},
        {"if": {"not": {"eq": {"sig": [
            "md5.hex()", ["append()", "${name}", "${timestamp}", "secret1"]]}}},
         "then": {"error": "sig not match"}},
        {"if": {"not": {"lt": {"timestamp": 1_700_000_300},
                          "gt": {"timestamp": 1_699_999_700}}},
         "then": {"error": "time is valid"}},
    ],
    "properties": {
        "age": {"type": "number", "maximum": 100, "minimum": 0},
        "hobby": {"type": "array",
                   "items": {"type": "string", "enum": ["ball", "game", "music"]}},
        "name": {"type": "string", "startWith": "b", "maxLength": 32},
    },
}
