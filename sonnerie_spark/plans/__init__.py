"""Plan-building helpers: key-filter analysis, pruning bounds."""
