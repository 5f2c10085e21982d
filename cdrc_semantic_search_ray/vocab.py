"""Closed vocabulary for the deterministic fixture grammar (FIXTURES.md F1/F2).

Three disjoint word universes (asserted disjoint in tests/test_fixtures.py):

1. PREDICATES — the closed predicate vocabulary (~14 verb phrases). Analogue of
   the reference's retrieval-relevant relations; fixed so golden triples are
   derivable by construction.
2. Entity-name material — syllable/name lists entity names are built from.
3. DISTRACTOR_WORDS — filler vocabulary for no-triple sentences.

Multi-word predicates ("depends on", "reads from") exercise longest-match in
the extractor; the coref pronoun exercises conversation-order dependence
(reassembly is semantically required, not decorative).
"""

from __future__ import annotations

# --- predicates (longest-first matching matters: "reads from" vs "reads") ---
PREDICATES: list[str] = [
    "collaborates with",
    "depends on",
    "reads from",
    "writes to",
    "located in",
    "works for",
    "deployed",
    "maintains",
    "monitors",
    "extends",
    "queries",
    "created",
    "uses",
    "cites",
]

# Coref: a sentence "It also <pred> <obj>." resolves "It" to the subject of the
# most recent triple earlier in the SAME conversation (turn order, then
# sentence order). This is the reason conversation reassembly must precede
# extraction.
COREF_PRONOUN = "It"

# --- entity-name material (disjoint from predicates & distractors) ----------
FIRST_NAMES = [
    "Aiko", "Bram", "Cleo", "Dario", "Elif", "Farid", "Greta", "Hana",
    "Ivo", "Jara", "Kenji", "Lena", "Milan", "Nadia", "Omar", "Priya",
    "Quinn", "Rosa", "Soren", "Talia", "Umar", "Vera", "Wren", "Xenia",
    "Yusuf", "Zofia",
]
LAST_NAMES = [
    "Almeida", "Bergstrom", "Castellan", "Dubois", "Eriksen", "Fontaine",
    "Galloway", "Hoffmann", "Ibarra", "Jansen", "Kowalski", "Lindqvist",
    "Moretti", "Novak", "Okafor", "Petrov", "Quintero", "Rahimi",
    "Sandoval", "Takahashi", "Ursu", "Vasquez", "Whitfield", "Yamamoto",
]
ORG_PREFIX = [
    "Lumen", "Vertex", "Borealis", "Cascadia", "Meridian", "Halcyon",
    "Polaris", "Zenith", "Aurora", "Solstice", "Ember", "Frontier",
]
ORG_SUFFIX = ["Labs", "Analytics", "Institute", "Collective", "Foundry",
              "Dynamics", "Holdings", "Consortium"]
TOOL_STEMS = [
    "Flux", "Grid", "Pulse", "Nimbus", "Quartz", "Vector", "Drift",
    "Beacon", "Cinder", "Onyx", "Tessera", "Argon",
]
TOOL_SUFFIX = ["kit", "ctl", "forge", "pipe", "bench", "graph", "ml"]
DATASET_STEMS = [
    "Census", "Mobility", "Retail", "Housing", "Transit", "Airquality",
    "Footfall", "Landuse", "Deprivation", "Broadband",
]
DATASET_SUFFIX = ["Atlas", "Panel", "Register", "Survey", "Archive",
                  "Tracker", "Index", "Corpus"]
PLACE_STEMS = [
    "Northgate", "Eastmoor", "Wexbridge", "Calderton", "Ferndale",
    "Ashcombe", "Holloway", "Kestrelford", "Marlowe", "Thornbury",
]
CONCEPT_STEMS = [
    "Gentrification", "Accessibility", "Segregation", "Urbanisation",
    "Connectivity", "Resilience", "Sustainability", "Inequality",
    "Walkability", "Densification",
]

# --- distractor filler (no overlap with the above, nor with predicates) -----
DISTRACTOR_WORDS = [
    "the", "overall", "latency", "throughput", "metric", "improves",
    "slowly", "steadily", "pipeline", "stage", "batch", "shard", "today",
    "yesterday", "again", "roughly", "nightly", "report", "dashboard",
    "looks", "fine", "noisy", "stable", "flaky", "rerun", "finished",
    "queued", "pending", "checking", "numbers", "small", "large",
]

TOOL_COLUMN_VALUES = ["", "bash", "search", "editor", "browser", "python"]
ROLES = ["user", "assistant", "system", "tool"]

ENTITY_KINDS = ["person", "org", "tool", "dataset", "place", "concept"]


def predicate_words() -> set[str]:
    out: set[str] = set()
    for p in PREDICATES:
        out.update(p.lower().split())
    return out
