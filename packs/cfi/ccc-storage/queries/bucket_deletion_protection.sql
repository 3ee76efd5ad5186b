-- CCC.ObjStor.C03: bucket deletion protection.
-- Spark translation of packs/cfi/ccc-storage/queries/bucket_deletion_protection.sql:
-- json_extract_string -> extract_json, json_extract -> json_path macro,
-- ARRAY[...] -> array(...), array_filter -> filter,
-- array_to_string -> array_join.
WITH bucket_versioning AS (
    SELECT
        r.id,
        r.name,
        r.arn,
        r.region,
        r.account_id,
        extract_json(r.raw_data, '$.Versioning.Status') AS versioning_status,
        extract_json(r.raw_data, '$.Versioning.MfaDelete') AS mfa_delete_status,
        r.tags,
        r.scanned_at
    FROM aws_resources r
    WHERE r.type = 'AWS::S3::Bucket'
),
bucket_lifecycle AS (
    SELECT
        r.id,
        r.name,
        json_path(r.raw_data, '$.LifecycleConfiguration.Rules') AS lifecycle_rules,
        CASE
            WHEN json_path(r.raw_data, '$.LifecycleConfiguration.Rules') IS NOT NULL
            THEN true
            ELSE false
        END AS has_lifecycle_policy
    FROM aws_resources r
    WHERE r.type = 'AWS::S3::Bucket'
),
bucket_policy AS (
    SELECT
        r.id,
        r.name,
        extract_json(r.raw_data, '$.Policy') AS bucket_policy,
        CASE
            WHEN extract_json(r.raw_data, '$.Policy') LIKE '%s3:DeleteBucket%'
                AND extract_json(r.raw_data, '$.Policy') LIKE '%Deny%'
            THEN true
            ELSE false
        END AS has_delete_protection_policy
    FROM aws_resources r
    WHERE r.type = 'AWS::S3::Bucket'
),
bucket_protection_analysis AS (
    SELECT
        bv.*,
        bl.has_lifecycle_policy,
        bl.lifecycle_rules,
        bp.has_delete_protection_policy,
        bp.bucket_policy,
        CASE
            WHEN bv.versioning_status = 'Enabled' THEN true
            ELSE false
        END AS has_versioning,
        CASE
            WHEN bv.mfa_delete_status = 'Enabled' THEN true
            ELSE false
        END AS has_mfa_delete,
        CASE
            WHEN bv.versioning_status = 'Enabled'
                AND (bl.has_lifecycle_policy OR bp.has_delete_protection_policy)
            THEN true
            ELSE false
        END AS is_protected
    FROM bucket_versioning bv
    LEFT JOIN bucket_lifecycle bl ON bv.id = bl.id
    LEFT JOIN bucket_policy bp ON bv.id = bp.id
),
protection_issues AS (
    SELECT *,
        array(
            CASE WHEN NOT has_versioning THEN 'Versioning not enabled' END,
            CASE WHEN NOT has_mfa_delete THEN 'MFA delete not enabled' END,
            CASE WHEN NOT has_lifecycle_policy AND NOT has_delete_protection_policy
                 THEN 'No lifecycle policy or bucket deletion protection' END
        ) AS protection_issues_list
    FROM bucket_protection_analysis
)

SELECT
    CASE WHEN NOT is_protected THEN 'FAIL' ELSE 'PASS' END AS status,
    id AS resource_id,
    name AS bucket_name,
    arn AS bucket_arn,
    region,
    account_id,
    CASE
        WHEN NOT is_protected THEN 'Bucket lacks adequate deletion protection mechanisms'
        ELSE 'Bucket has proper deletion protection'
    END AS issue_description,
    CASE WHEN NOT is_protected THEN 'CRITICAL' ELSE 'INFO' END AS severity,
    to_json(named_struct(
        'bucket_name', name,
        'region', region,
        'account_id', account_id,
        'versioning_status', versioning_status,
        'mfa_delete_status', mfa_delete_status,
        'has_lifecycle_policy', has_lifecycle_policy,
        'has_delete_protection_policy', has_delete_protection_policy,
        -- DuckDB's array_to_string returns NULL for an empty list; nullif
        -- reproduces that, and ignoreNullFields=false keeps null-valued
        -- keys (mfa_delete_status is usually absent) like json_object does.
        'protection_issues', nullif(array_join(filter(protection_issues_list, x -> x IS NOT NULL), ', '), ''),
        'retention_period_days', :retention_period_days,
        'tags', tags
    ), map('ignoreNullFields', 'false')) AS details,
    scanned_at
FROM protection_issues
ORDER BY is_protected ASC, bucket_name
