-- CCC.ObjStor.C02: uniform bucket-level access controls.
-- Spark translation of packs/cfi/ccc-storage/queries/uniform_bucket_access.sql:
-- json_extract_string -> extract_json, ARRAY[...] -> array(...),
-- array_filter -> filter, array_to_string -> array_join.
WITH bucket_public_access AS (
    SELECT
        r.id,
        r.name,
        r.arn,
        r.region,
        r.account_id,
        extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.BlockPublicAcls') AS block_public_acls,
        extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.BlockPublicPolicy') AS block_public_policy,
        extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.IgnorePublicAcls') AS ignore_public_acls,
        extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.RestrictPublicBuckets') AS restrict_public_buckets,
        COALESCE(extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.BlockPublicAcls'), 'false') = 'true' AS has_block_public_acls,
        COALESCE(extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.BlockPublicPolicy'), 'false') = 'true' AS has_block_public_policy,
        COALESCE(extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.IgnorePublicAcls'), 'false') = 'true' AS has_ignore_public_acls,
        COALESCE(extract_json(r.raw_data, '$.PublicAccessBlockConfiguration.RestrictPublicBuckets'), 'false') = 'true' AS has_restrict_public_buckets,
        r.tags,
        r.scanned_at
    FROM aws_resources r
    WHERE r.type = 'AWS::S3::Bucket'
),
non_compliant_buckets AS (
    SELECT *,
        CASE
            WHEN NOT (has_block_public_acls AND has_block_public_policy AND has_ignore_public_acls AND has_restrict_public_buckets)
            THEN true
            ELSE false
        END AS is_non_compliant,
        array(
            CASE WHEN NOT has_block_public_acls THEN 'BlockPublicAcls disabled' END,
            CASE WHEN NOT has_block_public_policy THEN 'BlockPublicPolicy disabled' END,
            CASE WHEN NOT has_ignore_public_acls THEN 'IgnorePublicAcls disabled' END,
            CASE WHEN NOT has_restrict_public_buckets THEN 'RestrictPublicBuckets disabled' END
        ) AS missing_controls
    FROM bucket_public_access
)

SELECT
    CASE WHEN is_non_compliant THEN 'FAIL' ELSE 'PASS' END AS status,
    id AS resource_id,
    name AS bucket_name,
    arn AS bucket_arn,
    region,
    account_id,
    CASE
        WHEN is_non_compliant THEN 'Bucket does not have uniform bucket-level access controls enabled'
        ELSE 'Bucket has proper uniform bucket-level access controls'
    END AS issue_description,
    CASE WHEN is_non_compliant THEN 'MEDIUM' ELSE 'INFO' END AS severity,
    to_json(named_struct(
        'bucket_name', name,
        'region', region,
        'account_id', account_id,
        'block_public_acls', block_public_acls,
        'block_public_policy', block_public_policy,
        'ignore_public_acls', ignore_public_acls,
        'restrict_public_buckets', restrict_public_buckets,
        -- DuckDB's array_to_string returns NULL for an empty list; nullif
        -- reproduces that so a compliant bucket's details match the oracle.
        'missing_controls', nullif(array_join(filter(missing_controls, x -> x IS NOT NULL), ', '), ''),
        'tags', tags
    -- ignoreNullFields=false: DuckDB's json_object keeps null-valued keys,
    -- Spark's to_json drops them by default.
    ), map('ignoreNullFields', 'false')) AS details,
    scanned_at
FROM non_compliant_buckets
ORDER BY is_non_compliant DESC, bucket_name
