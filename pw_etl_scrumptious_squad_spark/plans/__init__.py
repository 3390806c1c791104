"""Pipeline plans: batch ETL orchestration."""
