"""Source readers mirroring the reference's connector shapes (SURVEY.md §2.1).

The reference's 14 reader families collapse into four Ray-Data shapes; HTTP/
SQL/LDAP connectors are modeled as *partitioned fetch* stages (the page/file
list is the input dataset; the fetch runs in a rate-limitable actor pool)
so the same plumbing works against real services outside this sandbox.
"""

from mex_extractors_ray.sources.readers import (
    PaginatedFetch,
    read_csv_source,
    read_json_source,
    read_xml_records,
    paginated_source,
)

__all__ = [
    "PaginatedFetch",
    "read_csv_source",
    "read_json_source",
    "read_xml_records",
    "paginated_source",
]
