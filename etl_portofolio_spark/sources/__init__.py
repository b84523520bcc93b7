"""Source operators (SURVEY.md §2.1): JDBC pushdown, HTTP XML-query API."""
