package graft.sources

/** Path/name semantics of the reference blueprints, re-expressed as
  * pure functions (reference: upload_file.py:50–133 and
  * download_file.py:50–135 — clean_folder_name,
  * combine_folder_and_file_name, enumerate_destination_file_name,
  * determine_destination_file_name/_full_path).
  */
object PathUtils {

  /** Collapse duplicate '/' and resolve '.'/'..' segments (the
    * behavior of Python's os.path.normpath for relative-safe inputs).
    */
  def normPath(p: String): String = {
    if (p.isEmpty) return "."
    val absolute = p.startsWith("/")
    val segs = p.split("/").filter(s => s.nonEmpty && s != ".")
    val out = segs.foldLeft(List.empty[String]) {
      case (acc, "..") if acc.nonEmpty && acc.head != ".." => acc.tail
      case (acc, "..") if absolute => acc // ".." at root collapses
      case (acc, s) => s :: acc
    }.reverse
    val joined = out.mkString("/")
    if (absolute) "/" + joined
    else if (joined.isEmpty) "." else joined
  }

  /** clean_folder_name (upload_file.py:96): strip leading/trailing
    * '/', then normalize.
    */
  def cleanFolderName(folderName: String): String = {
    val stripped = folderName.stripPrefix("/").stripSuffix("/")
      .dropWhile(_ == '/').reverse.dropWhile(_ == '/').reverse
    if (stripped.isEmpty) "" else normPath(stripped)
  }

  /** combine_folder_and_file_name (upload_file.py:107). */
  def combine(folderName: String, fileName: String): String =
    normPath(s"$folderName${if (folderName.nonEmpty) "/" else ""}$fileName")

  /** enumerate_destination_file_name (upload_file.py:59): `a.ext` →
    * `a_N.ext` (first dot), `name` → `name_N`.
    */
  def enumerateDestinationFileName(name: String, fileNumber: Int = 1): String = {
    val i = name.indexOf('.')
    if (i >= 0) name.substring(0, i) + s"_$fileNumber" + name.substring(i)
    else s"${name}_$fileNumber"
  }

  /** determine_destination_file_name (upload_file.py:73): explicit
    * name (enumerated when fileNumber is set for multi-match) or the
    * basename of the source.
    */
  def determineDestinationFileName(
      sourceFullPath: String,
      destinationFileName: Option[String],
      fileNumber: Option[Int] = None): String =
    destinationFileName match {
      case Some(n) => fileNumber.map(enumerateDestinationFileName(n, _))
        .getOrElse(n)
      case None => sourceFullPath.split("/").last
    }

  /** determine_destination_full_path (upload_file.py:119). */
  def determineDestinationFullPath(
      destinationFolderName: String,
      destinationFileName: Option[String],
      sourceFullPath: String,
      fileNumber: Option[Int] = None): String =
    combine(cleanFolderName(destinationFolderName),
      determineDestinationFileName(sourceFullPath, destinationFileName,
        fileNumber))
}
