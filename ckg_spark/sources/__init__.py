from .readers import (
    obo_terms_df,
    parse_obo,
    read_fasta,
    read_gzip_tsv_lines,
    read_tsv,
)

__all__ = [
    "read_tsv",
    "read_gzip_tsv_lines",
    "read_fasta",
    "parse_obo",
    "obo_terms_df",
]
