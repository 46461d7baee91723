"""Ray Data stage builders.

Each module exposes either plain batch functions (stateless tasks) or
callable classes (actor-pool stages) to be plugged into
``Dataset.map_batches`` / ``groupby().map_groups`` — mirroring the
reference's split between per-chunk operator jobs and build-once index
state (SURVEY.md §2.4, §4).
"""
