package graft.model

/**
 * Core record model of the engine, re-expressing the reference's Avro
 * `MyEventRecord` ("BER") schema as Spark-encodable case classes.
 *
 * Reference schema (all leaves nullable `["null", T]` unions):
 * mediation/avro/MyEventRecord.java:17 — three nested records
 * Event / Customer / Notification. Spark mapping: `Encoders.product`
 * derives a StructType with three nested structs; `Option[_]` leaves
 * become nullable fields.
 */
final case class Event(
    id: Option[String] = None,
    transactionId: Option[String] = None,
    nhubTimestamp: Option[Long] = None // epoch millis
)

final case class Customer(
    id: Option[String] = None,
    fullName: Option[String] = None
)

final case class Notification(
    id: Option[String] = None,
    message: Option[String] = None,
    retries: Option[Int] = None,
    nhubSuccess: Option[Boolean] = None,
    amount: Option[Double] = None,
    successDescr: Option[String] = None
)

final case class MyEventRecord(
    event: Event = Event(),
    customer: Customer = Customer(),
    notification: Notification = Notification()
) {

  /** Idempotent key `"${event.transactionId}-${customer.id}"`
    * (mediation/avro/MyEventRecordUtils.scala:55). `null` fields print as
    * the literal "null", matching `String.valueOf` semantics the reference
    * inherits from Java string interpolation.
    */
  def idempotentKey: String =
    s"${event.transactionId.orNull}-${customer.id.orNull}"

  /** Validity predicate (mediation/avro/MyEventRecordUtils.scala:15-25):
    * transactionId, notification.id and customer.id all present.
    */
  def isValid: Boolean =
    event.transactionId.isDefined && notification.id.isDefined &&
      customer.id.isDefined

  /** Bootstrap records are tagged by prefixing event.id
    * (mediation/avro/MyEventRecordUtils.scala:57-65).
    */
  def isInitialLoad: Boolean =
    event.id.exists(_.startsWith(MyEventRecord.InitialLoadPrefix))

  def tagInitialLoad: MyEventRecord =
    copy(event = event.copy(id =
      Some(MyEventRecord.InitialLoadPrefix + event.id.getOrElse(""))))

  /** Rebuild with latency stamp = now
    * (mediation/avro/MyEventRecordUtils.scala:67-76). */
  def stampNow(nowMillis: Long): MyEventRecord =
    copy(event = event.copy(nhubTimestamp = Some(nowMillis)))

  /** Success enrichment (mediation/avro/MyEventRecordUtils.scala:81-118). */
  def withSuccess(success: Boolean, descr: String): MyEventRecord =
    copy(notification = notification.copy(
      nhubSuccess = Some(success),
      successDescr = Some(descr),
      retries = Some(notification.retries.getOrElse(0))))

  /** Retry increment: `null → 0, n → n+1`
    * (mediation/avro/MyEventRecordUtils.scala:120-131). */
  def incRetries: MyEventRecord =
    copy(notification = notification.copy(
      retries = Some(notification.retries.map(_ + 1).getOrElse(0))))
}

object MyEventRecord {
  val InitialLoadPrefix = "INITIAL_LOAD_"
}

/** HTTP request DTO: title=notification.id, body=notification.message,
  * userId=customer.id.toInt
  * (mediation/notification/NotificationFactory.scala:8-13,
  * mediation/notification/model/MyHttpRequest.scala:12-16).
  */
final case class HttpRequest(title: String, body: String, userId: Int)

object HttpRequest {
  def from(r: MyEventRecord): HttpRequest = HttpRequest(
    title = r.notification.id.getOrElse(""),
    body = r.notification.message.getOrElse(""),
    userId = r.customer.id.map(_.toInt).getOrElse(0))
}

/** HTTP response DTO (mediation/notification/model/MyHttpResponse.scala:32-37)
  * with the reference's marker constructors (:11-27).
  */
final case class NotificationResponse(
    id: Int, title: String, body: String, userId: Int) {

  /** success ⇔ body lacks "error"/"ko", case-insensitive
    * (MyHttpResponse.scala:19-27). */
  def isSuccess: Boolean = {
    val b = body.toLowerCase
    !b.contains("error") && !b.contains("ko")
  }
}

object NotificationResponse {
  /** Marker emitted for deduplicated records (MyHttpResponse.scala:11). */
  val SentOrDuplicated: NotificationResponse =
    NotificationResponse(-1, "SENT_OR_DUPLICATED", "SENT_OR_DUPLICATED", -1)

  /** KO response for failed sends (MyHttpResponse.scala:13-14). */
  def ko(reason: String): NotificationResponse =
    NotificationResponse(-1, "KO", s"ko: $reason", -1)
}

/** A record paired with its send outcome — the analytics-side output shape
  * (mediation/MediationService.scala:259-268).
  */
final case class SendResult(record: MyEventRecord, response: NotificationResponse)

/** Canonical mock fixtures mirroring
  * mediation/testing/NotificationsMockData.scala:7-54 (values public in the
  * reference; used only by tests).
  */
object MockData {
  private val msgQuique =
    "tienes un cargo de 101.0 EUR en tu cuenta *67890. Si quieres puedes pagarlo a plazos."
  private val msgAbuela =
    "tienes un cargo de 80000.0 EUR en tu cuenta *67890. Si quieres puedes pagarlo a plazos."

  val notSentDebitQuique: MyEventRecord = MyEventRecord(
    Event(Some("11"), Some("unique_kcop"), Some(1707680509490L)),
    Customer(Some("1"), Some("Quique Cortés")),
    Notification(Some("DEBIT_PURCHASE"), Some(msgQuique), None, None, None, None))

  val notSentDebitAbuela: MyEventRecord = MyEventRecord(
    Event(Some("22"), Some("unique_abu"), Some(1707680509490L)),
    Customer(Some("2"), Some("Abuela Moreno")),
    Notification(Some("DEBIT_PURCHASE"), Some(msgAbuela), None, None, None, None))

  val trueSentDebitQuique: MyEventRecord = notSentDebitQuique.copy(
    notification = notSentDebitQuique.notification.copy(
      retries = Some(0), nhubSuccess = Some(true),
      successDescr = Some("SUCESSFUL PUSH")))

  val invalidRecord: MyEventRecord = MyEventRecord()
}
