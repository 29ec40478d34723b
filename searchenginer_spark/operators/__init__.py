"""Relational/physical operators: term stats, dictionaries, postings, dedup,
suggestion, ANN. All DataFrame-in → DataFrame-out, lazily planned."""
