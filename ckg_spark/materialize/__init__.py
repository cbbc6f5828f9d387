from .graph import build_nodes, materialize_graph

__all__ = ["build_nodes", "materialize_graph"]
